"""Config-5 end-to-end (VERDICT r1 #3; SURVEY.md §7 stage 9): one command
chain pattern(--store-wav) -> train taco -> train vocoder -> synthesize with
WaveRNN sampling behind the pluggable vocode interface."""

import os

import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.synthesize import Synthesizer
from gst_tacotron_tpu.train import Trainer
from gst_tacotron_tpu.vocoder import (
    WaveRNNVocoder,
    load_wavernn_variables,
    make_vocoder,
)
from gst_tacotron_tpu.vocoder_train import VocoderTrainer

from test_train_smoke import small_cfg


def wavernn_cfg():
    return small_cfg(
        "gst_wavernn",
        **{
            "model.vocoder.wavernn_gru_dim": 16,
            "model.vocoder.wavernn_fc_dim": 16,
            "model.vocoder.wavernn_hop": 128,  # == audio.hop_length override
            "model.decoder.max_decode_steps": 6,
        },
    )


@pytest.fixture(scope="module")
def wav_pattern_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("patterns_wav"))
    cfg = wavernn_cfg()
    meta = generate_patterns(
        synthetic_utterances(6, num_speakers=1), cfg.audio, out, store_wav=True
    )
    assert all(e["has_wav"] for e in meta["entries"])
    return out


def test_config5_full_chain(wav_pattern_dir, tmp_path):
    cfg = wavernn_cfg()
    taco_work = str(tmp_path / "taco")
    voc_work = str(tmp_path / "voc")

    # stage 1: seq2seq model
    trainer = Trainer(cfg, wav_pattern_dir, taco_work)
    state = trainer.train(total_steps=1)

    # stage 2: vocoder
    vtrainer = VocoderTrainer(cfg, wav_pattern_dir, voc_work,
                              segment_frames=4, batch_size=2)
    vtrainer.train(total_steps=2)

    # stage 3: synthesis with the neural vocoder restored from disk
    vocoder = make_vocoder(cfg, vocoder_workdir=voc_work)
    assert isinstance(vocoder, WaveRNNVocoder)
    synth = Synthesizer(
        cfg, trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        vocoder=vocoder,
    )
    out = synth(["hello world."])
    hop = cfg.audio.hop_length
    r = cfg.model.decoder.reduction_factor
    assert out["wav"].shape == (1, cfg.model.decoder.max_decode_steps * r * hop)
    assert np.all(np.isfinite(out["wav"]))
    # mu-law decoded samples (1 + eps for expm1/log1p rounding at class 255)
    assert np.all(np.abs(out["wav"]) <= 1.0 + 1e-5)
    assert out["wav_lengths"][0] == out["frame_lengths"][0] * hop


def test_config5_cli_chain(wav_pattern_dir, tmp_path):
    """The same chain through the actual CLIs (flag plumbing included)."""
    from gst_tacotron_tpu import synthesize as synth_cli
    from gst_tacotron_tpu import vocoder_train as vt_cli
    from gst_tacotron_tpu.config import save_config

    cfg = wavernn_cfg()
    cfg_path = str(tmp_path / "cfg.json")
    save_config(cfg, cfg_path)
    taco_work = str(tmp_path / "taco_cli")
    voc_work = str(tmp_path / "voc_cli")
    out_dir = str(tmp_path / "out_cli")

    trainer = Trainer(cfg, wav_pattern_dir, taco_work)
    trainer.train(total_steps=1)

    vt_cli.main(["--config", cfg_path, "--patterns", wav_pattern_dir,
                 "--workdir", voc_work, "--steps", "1",
                 "--segment-frames", "4", "--batch-size", "2"])
    synth_cli.main(["--workdir", taco_work, "--out", out_dir,
                    "--texts", "a cli test.",
                    "--vocoder", "wavernn", "--vocoder-workdir", voc_work])
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 1
    assert os.path.getsize(os.path.join(out_dir, wavs[0])) > 100


def test_load_wavernn_variables_shapes(wav_pattern_dir, tmp_path):
    cfg = wavernn_cfg()
    voc_work = str(tmp_path / "voc2")
    vtrainer = VocoderTrainer(cfg, wav_pattern_dir, voc_work,
                              segment_frames=4, batch_size=2)
    final = vtrainer.train(total_steps=1)
    restored = load_wavernn_variables(cfg, voc_work)
    import jax

    trained = jax.device_get(final.params)
    got = jax.device_get(restored["params"])
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, atol=1e-6)
