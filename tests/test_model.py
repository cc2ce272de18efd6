"""Full-model forward/infer tests for the driver configs (BASELINE.json:7-11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import Config, apply_overrides, get_preset
from gst_tacotron_tpu.models import GSTTacotron
from gst_tacotron_tpu.text import NUM_SYMBOLS


def tiny_model_overrides():
    return {
        "model.encoder.embedding_dim": 32,
        "model.encoder.prenet_dims": [32, 16],
        "model.encoder.cbhg_bank_k": 4,
        "model.encoder.cbhg_bank_channels": 16,
        "model.encoder.cbhg_proj_channels": [16, 16],
        "model.encoder.cbhg_highway_layers": 2,
        "model.encoder.cbhg_highway_dim": 16,
        "model.encoder.cbhg_gru_dim": 16,
        "model.gst.ref_conv_channels": [4, 8, 16],
        "model.gst.ref_gru_dim": 16,
        "model.gst.style_dim": 16,
        "model.gst.num_heads": 4,
        "model.attention.dim": 16,
        "model.attention.location_filters": 4,
        "model.attention.location_kernel_size": 7,
        "model.decoder.prenet_dims": [32, 16],
        "model.decoder.attention_rnn_dim": 16,
        "model.decoder.decoder_rnn_dim": 16,
        "model.decoder.max_decode_steps": 6,
        "model.postnet.cbhg_bank_k": 2,
        "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [16, 80],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 16,
        "model.postnet.cbhg_gru_dim": 16,
        "model.num_mels": 80,
        "model.num_freq": 257,
        "model.speaker_dim": 8,
    }


def tiny_config(preset: str) -> Config:
    return apply_overrides(get_preset(preset), tiny_model_overrides())


def make_batch(cfg: Config, batch=2, t_text=7, t_mel=8):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(2, 40, (batch, t_text)), jnp.int32)
    token_lengths = jnp.array([t_text, t_text - 2])
    mel = jnp.asarray(rng.standard_normal((batch, t_mel, cfg.model.num_mels)),
                      jnp.float32)
    return tokens, token_lengths, mel


def init_model(cfg: Config, tokens, token_lengths, mel, **kwargs):
    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, token_lengths, mel, train=False, **kwargs,
    )
    return model, variables


@pytest.mark.parametrize("preset", ["taco1_lj", "gst_lj"])
def test_forward_shapes(preset):
    cfg = tiny_config(preset)
    tokens, token_lengths, mel = make_batch(cfg)
    kwargs = {"ref_mel": mel} if cfg.model.gst.enabled else {}
    model, variables = init_model(cfg, tokens, token_lengths, mel, **kwargs)
    out, _ = model.apply(
        variables, tokens, token_lengths, mel, train=True, **kwargs,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert out["mel"].shape == mel.shape
    assert out["linear"].shape == (2, 8, cfg.model.num_freq)
    assert out["stop_logits"].shape == (2, 8)
    assert out["alignments"].shape[0] == 2
    if cfg.model.gst.enabled:
        assert out["style_embedding"].shape == (2, cfg.model.gst.style_dim)
        assert out["style_attention"].shape == (2, 4, 10)


def test_infer_gst_with_reference_audio():
    cfg = tiny_config("gst_lj")
    tokens, token_lengths, mel = make_batch(cfg)
    model, variables = init_model(cfg, tokens, token_lengths, mel, ref_mel=mel)
    out = model.apply(
        variables, tokens, token_lengths, ref_mel=mel,
        method=model.infer, rngs={"dropout": jax.random.PRNGKey(2)},
    )
    r = cfg.model.decoder.reduction_factor
    steps = cfg.model.decoder.max_decode_steps
    assert out["mel"].shape == (2, steps * r, cfg.model.num_mels)
    assert out["frame_lengths"].shape == (2,)


def test_infer_gst_with_token_weights():
    """Style control without reference audio (GST control path)."""
    cfg = tiny_config("gst_lj")
    tokens, token_lengths, mel = make_batch(cfg)
    model, variables = init_model(cfg, tokens, token_lengths, mel, ref_mel=mel)
    w = jnp.zeros((2, 10)).at[:, 3].set(1.0)
    out = model.apply(
        variables, tokens, token_lengths, ref_mel=None, token_weights=w,
        method=model.infer, rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.all(np.asarray(out["style_attention"][:, :, 3]) == 1.0)


def test_multispeaker_conditioning_changes_output():
    cfg = tiny_config("gst_multispeaker")
    tokens, token_lengths, mel = make_batch(cfg)
    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    spk0 = jnp.array([0, 0])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, token_lengths, mel, ref_mel=mel, speaker_ids=spk0, train=False,
    )
    out0 = model.apply(
        variables, tokens, token_lengths, mel, ref_mel=mel, speaker_ids=spk0,
        train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    out1 = model.apply(
        variables, tokens, token_lengths, mel, ref_mel=mel,
        speaker_ids=jnp.array([5, 5]), train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(out0["mel"]), np.asarray(out1["mel"]))


def test_r1_location_sensitive_model():
    cfg = tiny_config("gst_r1_location")
    cfg = apply_overrides(cfg, {"model.decoder.max_decode_steps": 6})
    tokens, token_lengths, mel = make_batch(cfg, t_mel=6)
    model, variables = init_model(cfg, tokens, token_lengths, mel, ref_mel=mel)
    out = model.apply(
        variables, tokens, token_lengths, ref_mel=mel,
        method=model.infer, rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["mel"].shape == (2, 6, cfg.model.num_mels)
