"""JAX DSP — the on-device feature/vocoding path.

TPU-native counterpart of the reference's Audio.py (SURVEY.md §2.1 "Audio
DSP", §2.2 native accounting): feature extraction runs on-device behind the
host loader, Griffin-Lim is one jitted ``lax.fori_loop`` (the reference loops
~60 python iterations over librosa's C FFT), and the inverse-preemphasis IIR
is a ``lax.associative_scan`` first-order linear recurrence instead of a
sequential filter.

Everything here is shape-static and batch-first: wav (B, S) -> spect
(B, T, bins). The Pallas mel-STFT kernel in ``ops/stft_pallas.py`` implements
the same math (framing + window + DFT-as-matmul + mel matmul) for the MXU;
this module is the always-available jnp reference/fallback the kernel is
tested against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from .mel import mel_filterbank
from .ref import padded_window


def frame_indices(num_samples: int, n_fft: int, hop: int) -> np.ndarray:
    num_frames = 1 + (num_samples - n_fft) // hop
    return np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]


def num_frames_for(num_samples: int, cfg: AudioConfig) -> int:
    """Frame count for a center-padded signal of `num_samples` samples."""
    return 1 + num_samples // cfg.hop_length


class JaxDSP:
    """Precomputed-constant DSP ops for one AudioConfig.

    Methods are pure jnp functions of their array arguments (config constants
    are baked in), so they jit/vmap/shard cleanly.

    TPU note: this backend implements rfft but NOT irfft (verified:
    jnp.fft.irfft raises UNIMPLEMENTED on the v5e runtime here), and complex
    dtypes are second-class on TPU generally. The forward/inverse transforms
    therefore default to real-pair DFT-as-matmul (cos/sin bases on the MXU) —
    the same formulation as the Pallas STFT kernel — keeping Griffin-Lim
    fully on-device. `use_fft=True` selects the complex-FFT path (CPU
    testing/debugging only).
    """

    def __init__(self, cfg: AudioConfig, use_fft: bool = False):
        self.cfg = cfg
        self.use_fft = use_fft
        # NOTE: all constants are kept as NUMPY arrays on purpose: jit inlines
        # numpy closures as HLO literals, whereas closed-over committed device
        # arrays stall the axon remote-compile path (measured: np-const matmul
        # compiles in ~4s, dev-const version hangs for minutes).
        self.window = padded_window(cfg.win_length, cfg.n_fft).astype(np.float32)
        self.mel_basis = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax
        )  # (num_mels, num_freq)
        # real-pair DFT bases (forward: (n_fft, F); inverse: (F, n_fft))
        n_fft, n_freq = cfg.n_fft, cfg.num_freq
        n = np.arange(n_fft)[:, None].astype(np.float64)
        k = np.arange(n_freq)[None, :].astype(np.float64)
        ang = 2.0 * np.pi * n * k / n_fft
        self.dft_cos = np.cos(ang).astype(np.float32)        # (n_fft, F)
        self.dft_sin = (-np.sin(ang)).astype(np.float32)     # (n_fft, F)
        w = np.full((n_freq,), 2.0)
        w[0] = 1.0
        if n_fft % 2 == 0:
            w[-1] = 1.0
        self.idft_cos = ((w[:, None] * np.cos(ang.T)) / n_fft).astype(
            np.float32)                                      # (F, n_fft)
        self.idft_sin = ((-w[:, None] * np.sin(ang.T)) / n_fft).astype(
            np.float32)                                      # (F, n_fft)
        # Windowed-DFT conv kernel: with hop | n_fft, frame t of a chunked
        # signal is chunks[t : t + k] flattened, so the (n_fft, 2F) windowed
        # DFT matrix splits into k (hop, 2F) blocks and the whole
        # frame+window+DFT is ONE width-k VALID convolution over hop-chunks.
        # XLA lowers that straight onto the MXU with no (B, T, n_fft) frames
        # intermediate — the materialize-then-matmul formulation spent ~39 ms
        # per (8, 400-frame) batch on pure data movement (measured on v5e).
        k = cfg.n_fft // cfg.hop_length
        wd = (np.concatenate([self.dft_cos, self.dft_sin], axis=1)
              * self.window[:, None])                        # (n_fft, 2F)
        dft_taps = wd.reshape(k, cfg.hop_length, 2 * n_freq).astype(np.float32)
        # Zero-tap elision: with win_length < n_fft the padded window is zero
        # on whole hop-chunks (win_length 1024 / n_fft 2048 / hop 256 zeroes
        # chunks 0,1,6,7), so those taps of BOTH conv kernels are zero blocks
        # and the convs would spend half their MXU FLOPs multiplying zeros —
        # Griffin-Lim runs these two convs 15x per vocode, so this halves its
        # matmul work exactly. Keep only the live tap range [j0, j1);
        # stft_ri_precentered/istft_ri compensate with slices/padding.
        live = [j for j in range(k)
                if np.any(self.window[j * cfg.hop_length:
                                      (j + 1) * cfg.hop_length] != 0.0)]
        self.tap_j0, self.tap_j1 = (live[0], live[-1] + 1) if live else (0, k)
        self.dft_conv_kernel = np.ascontiguousarray(
            dft_taps[self.tap_j0: self.tap_j1])
        # Inverse direction, same idea run backwards: windowed inverse DFT +
        # overlap-add is a width-k conv of the (B, T, 2F) real-pair spectrum
        # against k (2F, hop) blocks of the windowed iDFT matrix, with
        # (k-1, k-1) time padding — out chunk c = sum_j ri[c-j] @ W_j. Kills
        # both the (B, T, n_fft) frames intermediate and the k shifted
        # .at[].add passes of the explicit overlap-add. Stacked tap jj reads
        # window section (k-1-jj), so the live range is the mirrored
        # [k-j1, k-j0) with padding reduced to match (see istft_ri).
        iw = (np.concatenate([self.idft_cos, self.idft_sin], axis=0)
              * self.window[None, :])                        # (2F, n_fft)
        idft_taps = np.stack(
            [iw[:, (k - 1 - j) * cfg.hop_length:(k - j) * cfg.hop_length]
             for j in range(k)], axis=0).astype(np.float32)  # (k, 2F, hop)
        self.idft_conv_kernel = np.ascontiguousarray(
            idft_taps[k - self.tap_j1: k - self.tap_j0])

    # -- framing ------------------------------------------------------------
    #
    # hop_length divides n_fft in every supported config, so framing and
    # overlap-add are expressed as hop-sized chunk reshapes + K static shifted
    # slices (K = n_fft/hop) instead of gathers/scatters. XLA compiles these
    # to plain strided copies/adds — crucial both for CPU compile time and for
    # clean Mosaic/TPU lowering.

    def _frame(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> (B, T, n_fft) with reflect center padding."""
        cfg = self.cfg
        assert cfg.n_fft % cfg.hop_length == 0, "hop must divide n_fft"
        k = cfg.n_fft // cfg.hop_length
        pad = cfg.n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        total = wav.shape[-1]
        num_frames = 1 + (total - cfg.n_fft) // cfg.hop_length
        num_chunks = total // cfg.hop_length
        chunks = wav[:, : num_chunks * cfg.hop_length].reshape(
            wav.shape[0], num_chunks, cfg.hop_length
        )
        # frame t = chunks[t : t + k] flattened
        parts = [chunks[:, j : j + num_frames] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)

    # -- forward STFT / features -------------------------------------------

    def stft_ri_precentered(self, wav: jnp.ndarray, low_precision: bool = False
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, L) ALREADY center-padded -> real/imag pair, each (B, T, F).

        Framing is fused into the windowed DFT as a width-k conv over
        hop-chunks (see dft_conv_kernel in __init__) — no frames
        intermediate touches HBM. low_precision: bf16 operands with f32
        accumulation (Griffin-Lim iterations only — see
        AudioConfig.griffin_lim_bf16)."""
        cfg = self.cfg
        hop = cfg.hop_length
        k = cfg.n_fft // hop
        num_chunks = wav.shape[-1] // hop
        num_frames = num_chunks - k + 1
        chunks = wav[:, : num_chunks * hop].reshape(
            wav.shape[0], num_chunks, hop)
        kern = self.dft_conv_kernel
        if low_precision:
            chunks = chunks.astype(jnp.bfloat16)
            kern = kern.astype(jnp.bfloat16)
        # kernel holds only the live window taps [tap_j0, tap_j1); frame t =
        # VALID-conv output at position t + tap_j0
        out = jax.lax.conv_general_dilated(
            chunks, kern,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        out = out[:, self.tap_j0: self.tap_j0 + num_frames]
        f = cfg.num_freq
        return out[..., :f], out[..., f:]

    def stft_ri(self, wav: jnp.ndarray, low_precision: bool = False
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S) -> real/imag pair, each (B, T, num_freq). Conv-fused DFT."""
        pad = self.cfg.n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        return self.stft_ri_precentered(wav, low_precision=low_precision)

    def stft(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> complex (B, T, num_freq)."""
        if self.use_fft:
            frames = self._frame(wav) * self.window[None, None, :]
            return jnp.fft.rfft(frames, n=self.cfg.n_fft, axis=-1)
        re, im = self.stft_ri(wav)
        return re + 1j * im

    def magnitude(self, wav: jnp.ndarray) -> jnp.ndarray:
        if self.use_fft:
            return jnp.abs(self.stft(wav))
        re, im = self.stft_ri(wav)
        return jnp.sqrt(re * re + im * im)

    def linear_spectrogram(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> normalized linear dB spect (B, T, num_freq)."""
        mag = self.magnitude(self.preemphasis(wav))
        s = amp_to_db(mag) - self.cfg.ref_level_db
        return normalize_db(s, self.cfg)

    def mel_spectrogram(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> normalized mel spect (B, T, num_mels)."""
        mag = self.magnitude(self.preemphasis(wav))
        mel = jnp.einsum("btf,mf->btm", mag, self.mel_basis)
        s = amp_to_db(mel) - self.cfg.ref_level_db
        return normalize_db(s, self.cfg)

    def features(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """One STFT shared by both feature maps: (mel, linear)."""
        mag = self.magnitude(self.preemphasis(wav))
        lin = normalize_db(amp_to_db(mag) - self.cfg.ref_level_db, self.cfg)
        mel = jnp.einsum("btf,mf->btm", mag, self.mel_basis)
        mel = normalize_db(amp_to_db(mel) - self.cfg.ref_level_db, self.cfg)
        return mel, lin

    def frame_precentered(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, L) ALREADY preemphasized + reflect-center-padded -> (B, T, n_fft).

        The batched feature extractors pad utterances to bucket lengths with
        zeros AFTER the host applies the per-utterance reflect padding; doing
        the reflect pad here (as `_frame` does) would fold zeros into the
        tail frames and break parity with the per-utterance oracle."""
        cfg = self.cfg
        k = cfg.n_fft // cfg.hop_length
        total = wav.shape[-1]
        num_frames = 1 + (total - cfg.n_fft) // cfg.hop_length
        num_chunks = total // cfg.hop_length
        chunks = wav[:, : num_chunks * cfg.hop_length].reshape(
            wav.shape[0], num_chunks, cfg.hop_length
        )
        parts = [chunks[:, j : j + num_frames] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)

    def features_from_frames(self, frames: jnp.ndarray
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, n_fft) raw frames -> (mel, linear), normalized dB."""
        frames = frames * self.window[None, None, :]
        re = jnp.einsum("btn,nf->btf", frames, self.dft_cos)
        im = jnp.einsum("btn,nf->btf", frames, self.dft_sin)
        return self._features_from_ri(re, im)

    def features_precentered(self, wav: jnp.ndarray
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, L) preemphasized + center-padded -> (mel, linear).

        The production on-device feature path (wav-transport train step,
        DeviceFeatureExtractor): conv-fused framing+DFT, then the shared
        mel/linear companding tail. Measured on v5e: 22 ms vs 56 ms per
        (8, 400-frame) batch standalone, and inside the donated train step
        it fuses to no measurable cost — the wav-transport step dropped
        448 -> 42 ms/step when this replaced materialize-frames+matmul."""
        re, im = self.stft_ri_precentered(wav)
        return self._features_from_ri(re, im)

    def _features_from_ri(self, re: jnp.ndarray, im: jnp.ndarray
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
        mag = jnp.sqrt(re * re + im * im)
        lin = normalize_db(amp_to_db(mag) - self.cfg.ref_level_db, self.cfg)
        mel = jnp.einsum("btf,mf->btm", mag, self.mel_basis)
        mel = normalize_db(amp_to_db(mel) - self.cfg.ref_level_db, self.cfg)
        return mel, lin

    # -- inverse ------------------------------------------------------------

    def _overlap_add(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_fft) windowed frames -> (B, n_fft + hop*(T-1)) via K
        static shifted adds of hop-sized chunks (no scatter)."""
        cfg = self.cfg
        b, num_frames, _ = frames.shape
        k = cfg.n_fft // cfg.hop_length
        chunks = frames.reshape(b, num_frames, k, cfg.hop_length)
        out_chunks = num_frames + k - 1
        out = jnp.zeros((b, out_chunks, cfg.hop_length), frames.dtype)
        for j in range(k):
            out = out.at[:, j : j + num_frames].add(chunks[:, :, j])
        return out.reshape(b, out_chunks * cfg.hop_length)

    def _istft_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Shared tail of the inverse: window, overlap-add, normalize, crop."""
        cfg = self.cfg
        num_frames = frames.shape[1]
        total = cfg.n_fft + cfg.hop_length * (num_frames - 1)
        out = self._overlap_add(frames * self.window[None, None, :])
        winsq = (self.window * self.window)[None, None, :]
        norm = self._overlap_add(
            jnp.broadcast_to(winsq, (1, num_frames, cfg.n_fft))
        )
        out = out / jnp.maximum(norm, 1e-10)
        return out[:, cfg.n_fft // 2 : total - cfg.n_fft // 2]

    def _win_norm(self, num_frames: int) -> np.ndarray:
        """Overlap-added window-square normalizer as a trace-time numpy
        constant (num_frames is static under jit)."""
        cfg = self.cfg
        total = cfg.n_fft + cfg.hop_length * (num_frames - 1)
        norm = np.zeros(total, np.float32)
        winsq = (self.window * self.window).astype(np.float32)
        for t in range(num_frames):
            norm[t * cfg.hop_length: t * cfg.hop_length + cfg.n_fft] += winsq
        return np.maximum(norm, 1e-10)[None, :]

    def istft_ri(self, re: jnp.ndarray, im: jnp.ndarray,
                 low_precision: bool = False) -> jnp.ndarray:
        """Real-pair (B, T, num_freq) -> (B, S). Conv-fused inverse DFT +
        overlap-add (the TPU backend has no irfft — see class docstring)."""
        cfg = self.cfg
        k = cfg.n_fft // cfg.hop_length
        num_frames = re.shape[1]
        total = cfg.n_fft + cfg.hop_length * (num_frames - 1)
        ri = jnp.concatenate([re, im], axis=-1)              # (B, T, 2F)
        kern = self.idft_conv_kernel
        if low_precision:
            ri = ri.astype(jnp.bfloat16)
            kern = kern.astype(jnp.bfloat16)
        # kernel holds only the live stacked taps [k-tap_j1, k-tap_j0);
        # padding shrinks to keep chunk c = sum_j ri[c-j] @ W_j exact
        chunks = jax.lax.conv_general_dilated(
            ri, kern,
            window_strides=(1,),
            padding=[(self.tap_j1 - 1, k - self.tap_j0 - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)              # (B, T+k-1, hop)
        out = chunks.reshape(ri.shape[0], total)
        out = out / self._win_norm(num_frames)
        return out[:, cfg.n_fft // 2: total - cfg.n_fft // 2]

    def istft(self, spect: jnp.ndarray) -> jnp.ndarray:
        """complex (B, T, num_freq) -> (B, S) with S = hop * (T - 1)."""
        if self.use_fft:
            frames = jnp.fft.irfft(spect, n=self.cfg.n_fft, axis=-1)
            return self._istft_frames(frames)
        return self.istft_ri(jnp.real(spect), jnp.imag(spect))

    def griffin_lim(self, magnitude: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        """(B, T, num_freq) magnitude -> (B, S) waveform.

        The reference runs ~60 host-side librosa iterations (SURVEY.md §3.3
        "second hot loop"); here the whole loop is one on-device fori_loop of
        real-pair matmul DFTs (MXU work, no complex dtypes).
        """
        cfg = self.cfg
        if key is None:
            re = magnitude
            im = jnp.zeros_like(magnitude)
        else:
            ang = jax.random.uniform(key, magnitude.shape, maxval=2.0 * np.pi)
            re = magnitude * jnp.cos(ang)
            im = magnitude * jnp.sin(ang)

        # Fast Griffin-Lim (Perraudin et al. 2013): extrapolate the iterate
        # with momentum alpha before each projection. alpha=0 (the default,
        # matching the reference's plain iteration) reduces exactly to the
        # classic update; alpha ~0.99 reaches the same spectral error in
        # roughly half the iterations. Same fori_loop, one extra axpy.
        alpha = cfg.griffin_lim_momentum

        lp = bool(cfg.griffin_lim_bf16)

        def body(_, s):
            re, im, pre, pim = s  # t_n and t_{n-1} (projected iterates)
            cre = re + alpha * (re - pre)
            cim = im + alpha * (im - pim)
            wav = self.istft_ri(cre, cim, low_precision=lp)
            re2, im2 = self.stft_ri(wav, low_precision=lp)
            scale = magnitude / jnp.maximum(
                jnp.sqrt(re2 * re2 + im2 * im2), 1e-16
            )
            return re2 * scale, im2 * scale, re, im

        re, im, _, _ = jax.lax.fori_loop(
            0, cfg.griffin_lim_iters, body, (re, im, re, im))
        return self.istft_ri(re, im)

    def inv_linear_spectrogram(
        self, spect: jnp.ndarray, key: jax.Array | None = None
    ) -> jnp.ndarray:
        """Normalized linear spect (B, T, F) -> waveform (B, S)."""
        cfg = self.cfg
        s = db_to_amp(denormalize_db(spect, cfg) + cfg.ref_level_db)
        wav = self.griffin_lim(s ** cfg.griffin_lim_power, key=key)
        return self.inv_preemphasis(wav)

    # -- preemphasis --------------------------------------------------------

    def preemphasis(self, wav: jnp.ndarray) -> jnp.ndarray:
        """y[t] = x[t] - coef * x[t-1] (FIR; trivially parallel)."""
        coef = self.cfg.preemphasis
        if coef == 0.0:
            return wav
        shifted = jnp.pad(wav, ((0, 0), (1, 0)))[:, :-1]
        return wav - coef * shifted

    def inv_preemphasis(self, wav: jnp.ndarray) -> jnp.ndarray:
        """y[t] = x[t] + coef * y[t-1] via parallel associative scan.

        The recurrence y_t = a*y_{t-1} + x_t composes as (a1,x1)∘(a2,x2) =
        (a1*a2, a2*x1 + x2), so a log-depth associative_scan replaces the
        sequential IIR filter of the reference.
        """
        coef = self.cfg.preemphasis
        if coef == 0.0:
            return wav

        a = jnp.full_like(wav, coef)

        def combine(left, right):
            al, xl = left
            ar, xr = right
            return al * ar, ar * xl + xr

        _, y = jax.lax.associative_scan(combine, (a, wav), axis=1)
        return y


# ---------------------------------------------------------------------------
# Stateless companding helpers (shared with the Pallas kernels)
# ---------------------------------------------------------------------------


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    unit = (s - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_norm:
        return jnp.clip(
            2.0 * cfg.max_abs_value * unit - cfg.max_abs_value,
            -cfg.max_abs_value,
            cfg.max_abs_value,
        )
    return jnp.clip(unit, 0.0, 1.0)


def denormalize_db(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    if cfg.symmetric_norm:
        unit = (jnp.clip(s, -cfg.max_abs_value, cfg.max_abs_value) + cfg.max_abs_value) / (
            2.0 * cfg.max_abs_value
        )
    else:
        unit = jnp.clip(s, 0.0, 1.0)
    return unit * (-cfg.min_level_db) + cfg.min_level_db


def mulaw_encode(wav: jnp.ndarray, bits: int) -> jnp.ndarray:
    """mu-law compand to integer classes [0, 2**bits) (WaveRNN target)."""
    mu = 2 ** bits - 1
    x = jnp.clip(wav, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mulaw_decode(classes: jnp.ndarray, bits: int) -> jnp.ndarray:
    mu = 2 ** bits - 1
    y = 2.0 * classes.astype(jnp.float32) / mu - 1.0
    wav = jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(float(mu)))) / mu
    # expm1/log1p rounding can exceed 1 by ~1e-6 at the extreme classes
    return jnp.clip(wav, -1.0, 1.0)
