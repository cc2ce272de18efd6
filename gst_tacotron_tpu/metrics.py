"""Metrics / logging (reference tf.summary scalars; SURVEY.md §5).

Writers: console, JSONL (always), and TensorBoard through clu's metric
writers when available. Also hosts the quantitative north-star metrics
helpers (audio-seconds/sec/chip, decode steps/sec; BASELINE.json:2)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from clu import metric_writers

                self._tb = metric_writers.SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        scalars = {
            (f"{prefix}/{k}" if prefix else k): float(v) for k, v in metrics.items()
        }
        rec = {"step": int(step), "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.write_scalars(step, scalars)

    def write_images(self, step: int, images: Dict[str, "object"]) -> None:
        """TensorBoard image summaries (the reference writes alignment /
        spectrogram images via tf.summary; SURVEY.md §2.1 logging row).
        Values are (H, W) or (H, W, C) float arrays in [0, 1]."""
        if self._tb is None:
            return
        import numpy as np

        prepped = {}
        for k, v in images.items():
            a = np.asarray(v, np.float32)
            lo, hi = float(a.min()), float(a.max())
            a = (a - lo) / max(hi - lo, 1e-9)
            if a.ndim == 2:
                a = a[..., None]
            prepped[k] = a[None]  # clu expects (N, H, W, C)
        self._tb.write_images(step, prepped)

    def write_audios(self, step: int, audios: Dict[str, "object"],
                     sample_rate: int) -> None:
        """TensorBoard audio summaries (reference tf.summary.audio). Values
        are (S,) float waveforms in [-1, 1]."""
        if self._tb is None:
            return
        import numpy as np

        prepped = {
            k: np.clip(np.asarray(v, np.float32), -1.0, 1.0)[None, :, None]
            for k, v in audios.items()
        }
        try:
            self._tb.write_audios(step, prepped, sample_rate=sample_rate)
        except Exception:
            pass  # some clu writers lack audio support; scalars still flow

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def mel_cepstral_distortion(mel_a, mel_b, num_coeffs: int = 13) -> float:
    """MCD (dB) between two normalized mel sequences (T, M), the standard
    spectral-quality proxy: DCT-II cepstra (c1..cK, c0 energy excluded),
    10*sqrt(2)/ln10 * mean frame-wise L2. Sequences are truncated to the
    shorter length. Pure numpy — an eval metric, not a training op."""
    import numpy as np

    t = min(mel_a.shape[0], mel_b.shape[0])
    if t == 0:
        return float("nan")
    a = np.asarray(mel_a[:t], np.float64)
    b = np.asarray(mel_b[:t], np.float64)
    m = a.shape[1]
    # DCT-II basis (orthogonal), rows = cepstral index
    n = np.arange(m)
    k = np.arange(1, num_coeffs + 1)[:, None]
    basis = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * m))
    ca = a @ basis.T
    cb = b @ basis.T
    const = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(const * np.mean(np.linalg.norm(ca - cb, axis=1)))


def synthesis_metrics(num_audio_seconds: float, wall_seconds: float,
                      decode_steps: int, num_chips: int) -> Dict[str, float]:
    """The BASELINE.json:2 metric triple."""
    return {
        "audio_seconds_per_sec_per_chip": num_audio_seconds
        / max(wall_seconds, 1e-9) / max(num_chips, 1),
        "decode_steps_per_sec": decode_steps / max(wall_seconds, 1e-9),
        "wall_seconds": wall_seconds,
    }
