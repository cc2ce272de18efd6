"""DSP parity tests: JAX path vs numpy reference vs scipy (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from gst_tacotron_tpu.config import AudioConfig
from gst_tacotron_tpu.dsp import ref as dref
from gst_tacotron_tpu.dsp.jax_dsp import JaxDSP, mulaw_decode, mulaw_encode
from gst_tacotron_tpu.dsp.mel import mel_filterbank


CFG = AudioConfig()
SMALL = AudioConfig(n_fft=512, hop_length=128, win_length=512, griffin_lim_iters=8)


def make_wav(rng, n=22050, sr=22050):
    t = np.arange(n) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 440 * t)
    wav += 0.05 * rng.standard_normal(n)
    return wav.astype(np.float32)


def test_hann_window_matches_scipy():
    win = dref.hann_window(1024)
    np.testing.assert_allclose(win, sps.get_window("hann", 1024, fftbins=True), atol=1e-12)


def test_stft_matches_scipy(rng):
    wav = make_wav(rng)
    ours = dref.stft(wav, CFG)
    win = dref.padded_window(CFG.win_length, CFG.n_fft)
    _, _, zxx = sps.stft(
        wav,
        fs=CFG.sample_rate,
        window=win,
        nperseg=CFG.n_fft,
        noverlap=CFG.n_fft - CFG.hop_length,
        nfft=CFG.n_fft,
        boundary=None,
        padded=False,
    )
    # scipy scales by win.sum(); compare a center frame (edge padding differs).
    scale = win.sum()
    center = ours.shape[0] // 2
    # Find the scipy frame whose center matches: scipy frame k covers samples
    # [k*hop, k*hop+n_fft); ours frame t covers [t*hop - n_fft/2, ...) of the
    # original signal due to center padding. So ours[t] == scipy[t - n_fft/(2*hop)].
    off = CFG.n_fft // (2 * CFG.hop_length)
    np.testing.assert_allclose(
        ours[center], zxx[:, center - off] * scale, rtol=1e-4, atol=1e-4
    )


def test_istft_roundtrip(rng):
    wav = make_wav(rng)
    spec = dref.stft(wav, CFG)
    rec = dref.istft(spec, CFG, length=len(wav))
    # framing floors away the last (len % hop) samples; compare covered region
    covered = (len(wav) // CFG.hop_length) * CFG.hop_length
    np.testing.assert_allclose(rec[:covered], wav[:covered], atol=1e-5)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 2048, 80, 0.0, 8000.0)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    # every mel filter has support; filters tile the [fmin, fmax] band
    assert np.all(fb.sum(axis=1) > 0)
    # no energy above fmax bin
    freqs = np.linspace(0, 22050 / 2, 1025)
    above = freqs > 8000.0 + 30
    assert fb[:, above].sum() == 0


def test_spectrogram_shapes_and_range(rng):
    wav = make_wav(rng)
    lin = dref.spectrogram(wav, CFG)
    mel = dref.melspectrogram(wav, CFG)
    assert lin.shape[1] == CFG.num_freq
    assert mel.shape[1] == CFG.num_mels
    assert lin.shape[0] == mel.shape[0]
    assert lin.min() >= 0.0 and lin.max() <= 1.0
    assert mel.min() >= 0.0 and mel.max() <= 1.0


def test_jax_matches_numpy_features(rng):
    wav = make_wav(rng, n=8192)
    dsp = JaxDSP(SMALL)
    jmel = np.asarray(dsp.mel_spectrogram(wav[None, :]))[0]
    jlin = np.asarray(dsp.linear_spectrogram(wav[None, :]))[0]
    nmel = dref.melspectrogram(wav, SMALL)
    nlin = dref.spectrogram(wav, SMALL)
    assert jmel.shape == nmel.shape
    assert jlin.shape == nlin.shape
    np.testing.assert_allclose(jmel, nmel, atol=2e-3)
    np.testing.assert_allclose(jlin, nlin, atol=2e-3)


def test_jax_istft_roundtrip(rng):
    wav = make_wav(rng, n=8192)
    dsp = JaxDSP(SMALL)
    spec = dsp.stft(wav[None, :])
    rec = np.asarray(dsp.istft(spec))[0]
    n = min(len(rec), len(wav))
    np.testing.assert_allclose(rec[:n], wav[:n], atol=1e-4)


def test_jax_inv_preemphasis_matches_scipy(rng):
    wav = make_wav(rng, n=4096)
    dsp = JaxDSP(SMALL)
    pre = np.asarray(dsp.preemphasis(wav[None, :]))[0]
    np.testing.assert_allclose(pre, dref.preemphasis(wav, SMALL.preemphasis), atol=1e-5)
    inv = np.asarray(dsp.inv_preemphasis(pre[None, :]))[0]
    np.testing.assert_allclose(inv, wav, atol=1e-3)


def test_griffin_lim_reconstructs(rng):
    """GL from the true magnitude should land close to a signal with the same
    magnitude spectrogram (SNR check on the magnitudes, not the waveform)."""
    wav = make_wav(rng, n=8192)
    dsp = JaxDSP(SMALL)
    mag = np.asarray(dsp.magnitude(wav[None, :]))

    def gl_err(iters):
        d = JaxDSP(AudioConfig(n_fft=512, hop_length=128, win_length=512,
                               griffin_lim_iters=iters))
        rec = np.asarray(d.griffin_lim(mag))
        mag_rec = np.asarray(d.magnitude(rec))
        return np.linalg.norm(mag - mag_rec) / np.linalg.norm(mag)

    e8, e32 = gl_err(8), gl_err(32)
    assert e8 < 0.35, f"griffin-lim magnitude error {e8:.3f}"
    assert e32 < e8, "more iterations must reduce magnitude error"


def test_griffin_lim_momentum_accelerates():
    """Fast-GLA (griffin_lim_momentum) must beat the plain iteration at equal
    iteration count. Fixed seed: the margin is signal-dependent, so the
    shared rng fixture (whose state depends on test order) is not used."""
    wav = make_wav(np.random.default_rng(1234), n=8192)
    dsp = JaxDSP(SMALL)
    mag = np.asarray(dsp.magnitude(wav[None, :]))

    def gl_err(iters, momentum):
        d = JaxDSP(AudioConfig(n_fft=512, hop_length=128, win_length=512,
                               griffin_lim_iters=iters,
                               griffin_lim_momentum=momentum))
        rec = np.asarray(d.griffin_lim(mag))
        mag_rec = np.asarray(d.magnitude(rec))
        return np.linalg.norm(mag - mag_rec) / np.linalg.norm(mag)

    plain16, fast16 = gl_err(16, 0.0), gl_err(16, 0.99)
    assert fast16 < plain16, (
        f"momentum should accelerate convergence: {fast16:.4f} vs {plain16:.4f}"
    )
    # ~half the iterations for comparable error
    assert gl_err(8, 0.99) < plain16 * 1.05


@pytest.mark.parametrize("seed,iters", [(7, 15), (23, 15), (101, 30)])
def test_griffin_lim_bf16_quality_neutral(seed, iters):
    """bf16 GL iterations (the TPU default, audio.griffin_lim_bf16) must not
    degrade spectral error vs f32 at PRODUCTION audio params. Measured
    equal-or-better across seeds (f32 0.164-0.173 vs bf16 0.135-0.160 at
    fast-GLA-15); assert within 5% relative AND 0.02 absolute of the f32
    error across multiple seeds/signals/iteration counts (ADVICE r3: one
    seed at one iteration count was too narrow a guard for a
    default-changing flag)."""
    wav = make_wav(np.random.default_rng(seed), n=65536)
    base = AudioConfig()  # production 2048/256/1024
    dspf = JaxDSP(base)
    mag = np.asarray(dspf.magnitude(wav[None, :]))

    def gl_err(bf16):
        d = JaxDSP(AudioConfig(griffin_lim_iters=iters,
                               griffin_lim_momentum=0.99,
                               griffin_lim_bf16=bf16))
        rec = np.asarray(d.griffin_lim(jnp.asarray(mag))).astype(np.float32)
        mag_rec = np.asarray(dspf.magnitude(rec))
        return np.linalg.norm(mag - mag_rec) / np.linalg.norm(mag)

    e32, e16 = gl_err(False), gl_err(True)
    assert e16 < e32 * 1.05, (
        f"bf16 GL degraded vs f32: {e16:.4f} vs {e32:.4f} "
        f"(seed {seed}, iters {iters})")
    assert e16 < 0.25, (
        f"bf16 GL absolute spectral error too high: {e16:.4f} "
        f"(seed {seed}, iters {iters})")


def test_inv_spectrogram_end_to_end(rng):
    wav = make_wav(rng, n=8192)
    dsp = JaxDSP(SMALL)
    lin = dsp.linear_spectrogram(wav[None, :])
    rec = np.asarray(dsp.inv_linear_spectrogram(lin))[0]
    assert rec.shape[0] > 4096
    assert np.all(np.isfinite(rec))
    # energy should be in the same ballpark as the input
    assert 0.05 < np.std(rec) < 5 * np.std(wav)


def test_mulaw_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    enc = np.asarray(mulaw_encode(x, 8))
    assert enc.min() >= 0 and enc.max() <= 255
    dec = np.asarray(mulaw_decode(enc, 8))
    np.testing.assert_allclose(dec, x, atol=2.5e-2)


def test_trim_silence(rng):
    sr = 22050
    sig = make_wav(rng, n=sr)
    padded = np.concatenate([np.zeros(sr // 2), sig, np.zeros(sr // 2)]).astype(np.float32)
    trimmed = dref.trim_silence(padded, CFG)
    assert len(trimmed) < len(padded)
    assert len(trimmed) >= len(sig) - 4096


def test_conv_fused_stft_matches_frames_path(rng):
    """features_precentered (conv-fused framing+DFT) must match the
    materialize-frames-then-matmul formulation it replaced."""
    import jax.numpy as jnp

    for cfg in (SMALL, AudioConfig()):
        dsp = JaxDSP(cfg)
        b = 3
        sig = (49 - 1) * cfg.hop_length + cfg.n_fft + 17  # ragged tail
        wav = rng.standard_normal((b, sig)).astype(np.float32) * 0.1
        mel_a, lin_a = dsp.features_precentered(jnp.asarray(wav))
        mel_b, lin_b = dsp.features_from_frames(dsp.frame_precentered(
            jnp.asarray(wav)))
        assert mel_a.shape == mel_b.shape and lin_a.shape == lin_b.shape
        np.testing.assert_allclose(mel_a, mel_b, atol=5e-4)
        np.testing.assert_allclose(lin_a, lin_b, atol=5e-4)
