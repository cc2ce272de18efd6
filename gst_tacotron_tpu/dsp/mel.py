"""Mel filterbank construction (shared by the numpy reference and JAX paths).

Reference parity: the reference's Audio.py builds its mel basis through
librosa (SURVEY.md §2.1 "Audio DSP"); librosa's default is the Slaney-style
mel scale with Slaney area normalization. librosa is not installed here, so
this is a from-scratch implementation of the same formulas, with an HTK
option. The filterbank is a dense (num_mels, num_freq) matrix so the mel
projection is a single MXU matmul on TPU.
"""

from __future__ import annotations

import numpy as np

_F_SP = 200.0 / 3  # Slaney: linear region slope (Hz per mel)
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq: np.ndarray, htk: bool = False) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    mel = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel: np.ndarray, htk: bool = False) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    freq = mel * _F_SP
    log_region = mel >= _MIN_LOG_MEL
    freq = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), freq)
    return freq


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    num_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape (num_mels, n_fft // 2 + 1)."""
    if fmax is None:
        fmax = sample_rate / 2.0

    num_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, num_freq)

    mel_min = hz_to_mel(np.array(fmin), htk=htk)
    mel_max = hz_to_mel(np.array(fmax), htk=htk)
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk=htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
        weights *= enorm[:, None]

    return weights.astype(dtype)


def mel_pseudo_inverse(mel_basis: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Moore-Penrose pseudo-inverse for approximate mel -> linear expansion."""
    return np.linalg.pinv(mel_basis.astype(np.float64)).astype(dtype)
