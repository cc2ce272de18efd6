"""Parity harness round-trip: generate golden fixtures from a deterministic
model, then verify the harness reports allclose-vs-self and catches drift
(SURVEY.md §7 stage 10 scaffolding; real reference fixtures plug in the
same way once a reference checkpoint exists)."""

import os

import numpy as np
import pytest

from gst_tacotron_tpu.parity import run_parity, save_fixture
from gst_tacotron_tpu.synthesize import Synthesizer
from gst_tacotron_tpu.train import Trainer

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from tests.test_train_smoke import small_cfg


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    cfg = small_cfg()
    cfg = apply_overrides(cfg, {"model.decoder.max_decode_steps": 5,
                                "audio.griffin_lim_iters": 2})
    patterns = str(tmp_path_factory.mktemp("p"))
    generate_patterns(synthetic_utterances(4), cfg.audio, patterns)
    trainer = Trainer(cfg, patterns, str(tmp_path_factory.mktemp("w")))
    state = trainer.train(total_steps=1)
    return Synthesizer(cfg, trainer.model,
                       {"params": state.params,
                        "batch_stats": state.batch_stats})


def test_self_parity_allclose(synth, tmp_path):
    fdir = str(tmp_path / "fixtures")
    os.makedirs(fdir)
    text = "the quick brown fox."
    out = synth([text], seed=0)
    frames = int(out["frame_lengths"][0])
    save_fixture(os.path.join(fdir, "fix0.npz"), text, out["mel"][0, :frames])

    report = str(tmp_path / "report.json")
    results = run_parity(synth, fdir, report_path=report)
    assert len(results) == 1
    # same model, same seed -> deterministic prenet dropout stream -> exact
    assert results[0].mel_mae < 1e-5
    assert results[0].allclose_1e3
    assert os.path.exists(report)


def test_parity_detects_drift(synth, tmp_path):
    fdir = str(tmp_path / "fixtures2")
    os.makedirs(fdir)
    text = "a different sentence."
    out = synth([text], seed=0)
    frames = int(out["frame_lengths"][0])
    drifted = out["mel"][0, :frames] + 0.05
    save_fixture(os.path.join(fdir, "fix1.npz"), text, drifted)
    results = run_parity(synth, fdir)
    assert results[0].mel_mae > 0.01
    assert not results[0].allclose_1e3


def test_mel_cepstral_distortion_properties():
    """MCD: 0 for identical inputs, positive and scale-monotone otherwise,
    agrees with a direct per-frame computation."""
    import numpy as np
    from gst_tacotron_tpu.metrics import mel_cepstral_distortion

    rng = np.random.default_rng(0)
    a = rng.random((40, 80)).astype(np.float32)
    assert mel_cepstral_distortion(a, a) == 0.0
    d1 = mel_cepstral_distortion(a, a + 0.01)
    d2 = mel_cepstral_distortion(a, a + 0.05)
    assert 0.0 < d1 < d2
    # truncation to the shorter sequence
    assert mel_cepstral_distortion(a, a[:20]) == 0.0
    # cross-check one frame against an explicit DCT
    b = a + 0.02 * rng.standard_normal(a.shape).astype(np.float32)
    m = a.shape[1]
    n = np.arange(m)
    k = np.arange(1, 14)[:, None]
    basis = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * m))
    diff = (a - b) @ basis.T
    expect = 10 * np.sqrt(2) / np.log(10) * np.mean(
        np.linalg.norm(diff, axis=1))
    got = mel_cepstral_distortion(a, b)
    np.testing.assert_allclose(got, expect, rtol=1e-6)
