"""Numpy reference DSP — the correctness oracle for the JAX/Pallas paths.

This mirrors the reference's Audio.py pipeline (SURVEY.md §2.1 "Audio DSP",
§3.1/§3.3 call stacks): preemphasis -> centered STFT (hann, win padded to
n_fft) -> |.| -> [mel] -> amp_to_db -> -ref_level_db -> normalize, and the
inverse denormalize -> db_to_amp -> magnitude**power -> Griffin-Lim -> istft
-> inverse preemphasis. librosa is unavailable, so the STFT/istft/Griffin-Lim
are implemented directly with numpy/scipy; tests pin this module against
scipy.signal where overlap exists, and the JAX path against this module.

All functions are single-utterance (1-D wav in, (frames, bins) out); batching
lives in the JAX path.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps

from ..config import AudioConfig
from .mel import mel_filterbank


# ---------------------------------------------------------------------------
# Windowing / framing
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches librosa/scipy sym=False)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def padded_window(win_length: int, n_fft: int) -> np.ndarray:
    """Hann window zero-padded symmetrically to n_fft (librosa convention)."""
    win = hann_window(win_length)
    if win_length == n_fft:
        return win
    pad = n_fft - win_length
    left = pad // 2
    return np.pad(win, (left, pad - left))


def frame_signal(wav: np.ndarray, n_fft: int, hop_length: int, center: bool = True) -> np.ndarray:
    """(samples,) -> (frames, n_fft) with reflect center-padding."""
    if center:
        wav = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    num_frames = 1 + (len(wav) - n_fft) // hop_length
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return wav[idx]


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def stft(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Complex STFT, shape (frames, n_fft//2 + 1)."""
    frames = frame_signal(wav.astype(np.float64), cfg.n_fft, cfg.hop_length)
    win = padded_window(cfg.win_length, cfg.n_fft)
    return np.fft.rfft(frames * win[None, :], n=cfg.n_fft, axis=-1)


def istft(spect: np.ndarray, cfg: AudioConfig, length: int | None = None) -> np.ndarray:
    """Inverse STFT via windowed overlap-add with squared-window normalization."""
    frames = np.fft.irfft(spect, n=cfg.n_fft, axis=-1)
    win = padded_window(cfg.win_length, cfg.n_fft)
    num_frames = frames.shape[0]
    total = cfg.n_fft + cfg.hop_length * (num_frames - 1)
    out = np.zeros(total)
    norm = np.zeros(total)
    winsq = win * win
    for t in range(num_frames):
        s = t * cfg.hop_length
        out[s : s + cfg.n_fft] += frames[t] * win
        norm[s : s + cfg.n_fft] += winsq
    out = out / np.maximum(norm, 1e-10)
    # Undo center padding.
    out = out[cfg.n_fft // 2 : total - cfg.n_fft // 2]
    if length is not None:
        if len(out) < length:
            out = np.pad(out, (0, length - len(out)))
        out = out[:length]
    return out


def griffin_lim(magnitude: np.ndarray, cfg: AudioConfig, seed: int = 0) -> np.ndarray:
    """Phase reconstruction: (frames, bins) magnitude -> waveform."""
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(magnitude.shape))
    s_complex = magnitude.astype(np.complex128) * angles
    for _ in range(cfg.griffin_lim_iters):
        wav = istft(s_complex, cfg)
        rebuilt = stft(wav, cfg)
        # Match frame count (istft->stft can change it by edge effects).
        rebuilt = rebuilt[: magnitude.shape[0]]
        phase = rebuilt / np.maximum(np.abs(rebuilt), 1e-16)
        s_complex = magnitude[: rebuilt.shape[0]] * phase
    return istft(s_complex, cfg)


# ---------------------------------------------------------------------------
# Companding / normalization
# ---------------------------------------------------------------------------


def preemphasis(wav: np.ndarray, coef: float) -> np.ndarray:
    return sps.lfilter([1.0, -coef], [1.0], wav)


def inv_preemphasis(wav: np.ndarray, coef: float) -> np.ndarray:
    return sps.lfilter([1.0], [1.0, -coef], wav)


def amp_to_db(x: np.ndarray) -> np.ndarray:
    return 20.0 * np.log10(np.maximum(1e-5, x))


def db_to_amp(x: np.ndarray) -> np.ndarray:
    return np.power(10.0, x * 0.05)


def normalize_db(s: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    unit = (s - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_norm:
        return np.clip(
            2.0 * cfg.max_abs_value * unit - cfg.max_abs_value,
            -cfg.max_abs_value,
            cfg.max_abs_value,
        )
    return np.clip(unit, 0.0, 1.0)


def denormalize_db(s: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    if cfg.symmetric_norm:
        unit = (np.clip(s, -cfg.max_abs_value, cfg.max_abs_value) + cfg.max_abs_value) / (
            2.0 * cfg.max_abs_value
        )
    else:
        unit = np.clip(s, 0.0, 1.0)
    return unit * (-cfg.min_level_db) + cfg.min_level_db


# ---------------------------------------------------------------------------
# End-to-end feature API (reference Audio.py surface)
# ---------------------------------------------------------------------------


def spectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """wav -> normalized linear spectrogram (frames, n_fft//2+1)."""
    d = stft(preemphasis(wav, cfg.preemphasis), cfg)
    s = amp_to_db(np.abs(d)) - cfg.ref_level_db
    return normalize_db(s, cfg).astype(np.float32)


def melspectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """wav -> normalized mel spectrogram (frames, num_mels)."""
    d = stft(preemphasis(wav, cfg.preemphasis), cfg)
    mel_basis = mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax
    ).astype(np.float64)
    mel = np.abs(d) @ mel_basis.T
    s = amp_to_db(mel) - cfg.ref_level_db
    return normalize_db(s, cfg).astype(np.float32)


def inv_spectrogram(spect: np.ndarray, cfg: AudioConfig, seed: int = 0) -> np.ndarray:
    """Normalized linear spectrogram -> waveform via Griffin-Lim."""
    s = db_to_amp(denormalize_db(spect.astype(np.float64), cfg) + cfg.ref_level_db)
    wav = griffin_lim(s ** cfg.griffin_lim_power, cfg, seed=seed)
    return inv_preemphasis(wav, cfg.preemphasis).astype(np.float32)


def trim_silence(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Energy-based silence trim (reference trims via librosa.effects.trim)."""
    frame = 2048
    hop = 512
    if len(wav) < frame:
        return wav
    n = 1 + (len(wav) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(wav[idx] ** 2, axis=-1))
    ref = np.max(rms)
    if ref <= 0:
        return wav
    db = 20.0 * np.log10(np.maximum(rms / ref, 1e-10))
    keep = np.where(db > -cfg.trim_top_db)[0]
    if len(keep) == 0:
        return wav
    start = keep[0] * hop
    end = min(len(wav), keep[-1] * hop + frame)
    return wav[start:end]
