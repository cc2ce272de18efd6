"""Encoder-kind switch (reference Taco_Version) + eval hook + debug flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.models import GSTTacotron
from gst_tacotron_tpu.text import NUM_SYMBOLS

from tests.test_model import make_batch, tiny_config


def test_taco2_encoder_model_forward():
    cfg = apply_overrides(tiny_config("taco1_lj"), {"model.encoder.kind": "taco2"})
    tokens, token_lengths, mel = make_batch(cfg)
    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, token_lengths, mel, train=False,
    )
    # taco2 encoder params exist, no CBHG bank
    enc = variables["params"]["encoder"]
    assert "convs" in enc and "bigru" in enc
    assert "cbhg" not in enc
    out = model.apply(
        variables, tokens, token_lengths, mel, train=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["mel"].shape == mel.shape


def test_unknown_encoder_kind_raises():
    cfg = apply_overrides(tiny_config("taco1_lj"), {"model.encoder.kind": "nope"})
    tokens, token_lengths, mel = make_batch(cfg)
    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    with pytest.raises(KeyError):
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tokens, token_lengths, mel, train=False,
        )


def test_default_eval_hook_writes_artifacts(tmp_path):
    from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
    from gst_tacotron_tpu.train import Trainer, default_eval_hook
    from tests.test_train_smoke import small_cfg
    import os

    cfg = small_cfg()
    cfg = apply_overrides(cfg, {
        "train.eval_sentences": ["hello there."],
        "model.decoder.max_decode_steps": 4,
        "audio.griffin_lim_iters": 2,
    })
    patterns = str(tmp_path / "p")
    generate_patterns(synthetic_utterances(4), cfg.audio, patterns)
    trainer = Trainer(cfg, patterns, str(tmp_path / "w"))
    default_eval_hook(trainer, step=1)
    art = os.path.join(str(tmp_path / "w"), "eval", "step_00000001")
    files = os.listdir(art)
    assert any(f.endswith(".wav") for f in files)
