"""Batched on-device feature extraction vs the numpy oracle (VERDICT r1 #2:
the flagship data path must touch the flagship DSP kernel — PallasDSP on TPU,
same code path in interpreter mode here)."""

import numpy as np
import pytest

from gst_tacotron_tpu.config import AudioConfig
from gst_tacotron_tpu.dsp import ref as dsp_ref
from gst_tacotron_tpu.dsp.device_features import DeviceFeatureExtractor

CFG = AudioConfig(n_fft=512, hop_length=128, win_length=512)


def _wavs(rng, lengths):
    return [rng.uniform(-0.5, 0.5, n).astype(np.float32) for n in lengths]


@pytest.mark.parametrize("use_pallas", [False, True, "fused", "resident"])
def test_batched_extraction_matches_oracle(rng, use_pallas):
    """Every frame — including the reflect-padded tail — matches the
    per-utterance numpy oracle, across uneven lengths in one batch."""
    lengths = [1000, 2500, 2048, 700, 5000, 1001]
    wavs = _wavs(rng, lengths)
    ex = DeviceFeatureExtractor(CFG, use_pallas=use_pallas, interpret=True,
                                batch_size=4, frame_bucket=8)
    results = ex.extract(wavs)
    assert len(results) == len(wavs)
    for wav, (mel, lin) in zip(wavs, results):
        ref_mel = dsp_ref.melspectrogram(wav, CFG)
        ref_lin = dsp_ref.spectrogram(wav, CFG)
        assert mel.shape == ref_mel.shape
        assert lin.shape == ref_lin.shape
        np.testing.assert_allclose(mel, ref_mel, atol=5e-4)
        np.testing.assert_allclose(lin, ref_lin, atol=5e-4)


def test_pattern_generation_device_matches_host(rng, tmp_path):
    """--device-features writes the same patterns as the numpy worker path."""
    from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
    from gst_tacotron_tpu.data.loader import PatternDataset

    utts = synthetic_utterances(5)
    host_dir, dev_dir = str(tmp_path / "host"), str(tmp_path / "dev")
    m1 = generate_patterns(utts, CFG, host_dir)
    m2 = generate_patterns(utts, CFG, dev_dir, device_features=True)
    assert [e["id"] for e in m1["entries"]] == [e["id"] for e in m2["entries"]]
    ds1, ds2 = PatternDataset(host_dir), PatternDataset(dev_dir)
    for i in range(len(ds1)):
        a, b = ds1.load(i), ds2.load(i)
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
        np.testing.assert_allclose(a["mel"], b["mel"], atol=5e-4)
        np.testing.assert_allclose(a["linear"], b["linear"], atol=5e-4)


def test_extraction_order_independent(rng):
    wavs = _wavs(rng, [900, 3000, 1500])
    ex = DeviceFeatureExtractor(CFG, use_pallas=False, batch_size=2,
                                frame_bucket=8)
    a = ex.extract(wavs)
    b = ex.extract(list(reversed(wavs)))
    for (m1, l1), (m2, l2) in zip(a, reversed(b)):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(l1, l2)
