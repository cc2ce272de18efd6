"""Pallas kernel parity tests (interpreter mode on CPU; SURVEY.md §4
"Pallas kernel vs jnp-reference kernel allclose")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import AudioConfig
from gst_tacotron_tpu.dsp.jax_dsp import JaxDSP
from gst_tacotron_tpu.ops.stft_pallas import PallasDSP, stft_features_pallas

SMALL = AudioConfig(n_fft=512, hop_length=128, win_length=512)


def make_wav(n=4096, batch=2):
    rng = np.random.default_rng(3)
    t = np.arange(n) / 22050
    wav = 0.4 * np.sin(2 * np.pi * 330 * t)[None, :] + 0.05 * rng.standard_normal(
        (batch, n)
    )
    return jnp.asarray(wav, jnp.float32)


def test_stft_kernel_matches_jnp_features():
    wav = make_wav()
    jdsp = JaxDSP(SMALL)
    pdsp = PallasDSP(SMALL, interpret=True)
    mel_ref, lin_ref = jdsp.features(wav)
    mel_k, lin_k = pdsp.features(wav)
    assert mel_k.shape == mel_ref.shape
    assert lin_k.shape == lin_ref.shape
    # normalized-dB units in [0,1]; DFT-matmul vs rfft agree to ~1e-3
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_ref), atol=5e-3)


def test_stft_fused_framing_matches_jnp_features_precentered():
    """The framing-fused kernel (VERDICT r2 #2a) must match the conv-fused
    jnp path bit-for-tolerance on the SAME precentered input contract."""
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas_fused

    cfg = SMALL
    wav = make_wav()
    jdsp = JaxDSP(cfg)
    pad = cfg.n_fft // 2
    prepped = jnp.pad(jdsp.preemphasis(wav), ((0, 0), (pad, pad)),
                      mode="reflect")
    mel_ref, lin_ref = jdsp.features_precentered(prepped)
    mel_k, lin_k = stft_features_pallas_fused(prepped, cfg, interpret=True)
    assert mel_k.shape == mel_ref.shape and lin_k.shape == lin_ref.shape
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_ref), atol=5e-3)


def test_stft_fused_framing_odd_frame_count():
    """Frame counts that don't divide the tile (and need chunk padding)."""
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas_fused

    cfg = SMALL
    jdsp = JaxDSP(cfg)
    wav = make_wav(n=3000, batch=3)
    pad = cfg.n_fft // 2
    prepped = jnp.pad(jdsp.preemphasis(wav), ((0, 0), (pad, pad)),
                      mode="reflect")
    mel_ref, lin_ref = jdsp.features_precentered(prepped)
    mel_k, lin_k = stft_features_pallas_fused(prepped, cfg, interpret=True)
    assert mel_k.shape == mel_ref.shape
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_ref), atol=5e-3)


def test_stft_resident_bases_matches_jnp_features_precentered():
    """The r5 resident-bases kernel (VMEM-held DFT/mel bases, whole-freq
    tiles) must match the conv-fused jnp path on the same contract."""
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas_resident

    cfg = SMALL
    wav = make_wav()
    jdsp = JaxDSP(cfg)
    pad = cfg.n_fft // 2
    prepped = jnp.pad(jdsp.preemphasis(wav), ((0, 0), (pad, pad)),
                      mode="reflect")
    mel_ref, lin_ref = jdsp.features_precentered(prepped)
    mel_k, lin_k = stft_features_pallas_resident(prepped, cfg, interpret=True)
    assert mel_k.shape == mel_ref.shape and lin_k.shape == lin_ref.shape
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_ref), atol=5e-3)


def test_stft_resident_bases_odd_frames_and_bf16():
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas_resident

    cfg = SMALL
    jdsp = JaxDSP(cfg)
    wav = make_wav(n=3000, batch=3)
    pad = cfg.n_fft // 2
    prepped = jnp.pad(jdsp.preemphasis(wav), ((0, 0), (pad, pad)),
                      mode="reflect")
    mel_ref, lin_ref = jdsp.features_precentered(prepped)
    mel_k, lin_k = stft_features_pallas_resident(prepped, cfg, interpret=True)
    assert mel_k.shape == mel_ref.shape
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_ref), atol=5e-3)
    # bf16 operand mode: serving-precision class (quiet bins see dB-scale
    # error; loud bins stay close) — assert shape + loud-region agreement
    mel_b, lin_b = stft_features_pallas_resident(
        prepped, cfg, interpret=True, bf16=True)
    assert mel_b.shape == mel_ref.shape
    loud = np.asarray(mel_ref) > 0.5
    if loud.any():
        err = np.abs(np.asarray(mel_b) - np.asarray(mel_ref))[loud]
        assert err.max() < 0.05


def test_stft_kernel_frame_padding():
    """Frame counts that don't divide the tile must round-trip unchanged."""
    cfg = SMALL
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((37, cfg.n_fft)), jnp.float32)
    mel, lin = stft_features_pallas(frames, cfg, interpret=True)
    assert mel.shape == (37, cfg.num_mels)
    assert lin.shape == (37, cfg.num_freq)
    assert np.all(np.isfinite(np.asarray(mel)))
