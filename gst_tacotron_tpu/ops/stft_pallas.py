"""Pallas TPU kernel: fused mel/linear STFT feature extraction.

Named per-chip speed-of-light target (BASELINE.json:5 "mel-spectrogram STFT
features computed as a Pallas kernel"; SURVEY.md §2.2). Replaces the
reference's librosa/pocketfft C path with an MXU formulation:

    frames (F, n_fft) --@ window-baked DFT cos/sin bases--> real/imag
      -> |.| -> [write normalized-dB linear tile]
      -> @ mel basis (accumulated over freq tiles) -> normalized-dB mel

Design notes:
  * The rFFT is expressed as two matmuls against (n_fft, n_freq) cos/sin
    bases with the Hann window folded in. For n_fft=2048 that is ~4.2 MFLOP
    per frame — dense MXU work at 100% utilization, beating an FFT's
    butterfly data movement on this hardware for these sizes.
  * Grid = (frame_tiles, freq_tiles); freq is the reduction ("arbitrary")
    dimension accumulating the mel projection in a VMEM scratch, so the full
    linear spectrogram never round-trips through HBM for the mel output.
  * Framing happens OUTSIDE the kernel with the hop-chunk reshape trick
    (dsp/jax_dsp.py), which XLA lowers to strided copies; the kernel reads
    contiguous (TILE_F, n_fft) frame tiles.
  * dB conversion + normalization are fused into the kernel epilogue (VPU).

The pure-jnp JaxDSP path remains the CPU fallback and the parity oracle
(tests/test_pallas.py runs this kernel in interpreter mode against it).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AudioConfig
from ..dsp.mel import mel_filterbank
from ..dsp.ref import padded_window

TILE_F = 128   # frames per tile (sublane dim)
TILE_K = 128   # freq bins per tile (lane dim)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _bases(cfg: AudioConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Window-baked DFT cos/sin bases and zero-padded mel basis."""
    n_fft = cfg.n_fft
    n_freq = cfg.num_freq
    n_freq_pad = _round_up(n_freq, TILE_K)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq_pad)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = padded_window(cfg.win_length, n_fft)[:, None]
    cos_b = (np.cos(ang) * win).astype(np.float32)
    sin_b = (-np.sin(ang) * win).astype(np.float32)
    # zero the padded freq columns so they contribute nothing
    cos_b[:, n_freq:] = 0.0
    sin_b[:, n_freq:] = 0.0
    mel = mel_filterbank(cfg.sample_rate, n_fft, cfg.num_mels, cfg.mel_fmin,
                         cfg.mel_fmax)  # (n_mels, n_freq)
    n_mels_pad = _round_up(cfg.num_mels, TILE_K)
    mel_pad = np.zeros((n_freq_pad, n_mels_pad), np.float32)
    mel_pad[:n_freq, : cfg.num_mels] = mel.T
    return cos_b, sin_b, mel_pad, n_freq_pad


def _norm_consts(cfg: AudioConfig):
    return dict(
        ref_db=float(cfg.ref_level_db),
        min_db=float(cfg.min_level_db),
        symmetric=bool(cfg.symmetric_norm),
        max_abs=float(cfg.max_abs_value),
    )


def _db_normalize(x, c):
    db = 20.0 * jnp.log10(jnp.maximum(x, 1e-5)) - c["ref_db"]
    unit = (db - c["min_db"]) / (-c["min_db"])
    if c["symmetric"]:
        return jnp.clip(2.0 * c["max_abs"] * unit - c["max_abs"],
                        -c["max_abs"], c["max_abs"])
    return jnp.clip(unit, 0.0, 1.0)


def _stft_kernel(frames_ref, cos_ref, sin_ref, mel_ref,
                 lin_out_ref, mel_out_ref, mel_acc, *, norm, num_freq_tiles,
                 normalize_linear):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        mel_acc[...] = jnp.zeros_like(mel_acc)

    frames = frames_ref[...]
    real = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(real * real + imag * imag)

    if normalize_linear:
        lin_out_ref[...] = _db_normalize(mag, norm)
    else:
        lin_out_ref[...] = mag

    mel_acc[...] += jnp.dot(mag, mel_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == num_freq_tiles - 1)
    def _():
        mel_out_ref[...] = _db_normalize(mel_acc[...], norm)


def stft_features_pallas(
    frames: jnp.ndarray,
    cfg: AudioConfig,
    *,
    normalize_linear: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(F, n_fft) raw (un-windowed) frames -> (mel (F, n_mels), linear (F, n_freq)).

    Features are normalized-dB, identical math to JaxDSP.features (the window
    is baked into the DFT bases here).
    """
    cos_b, sin_b, mel_b, n_freq_pad = _bases(cfg)
    num_frames = frames.shape[0]
    f_pad = _round_up(max(num_frames, TILE_F), TILE_F)
    if f_pad != num_frames:
        frames = jnp.pad(frames, ((0, f_pad - num_frames), (0, 0)))

    n_mels_pad = mel_b.shape[1]
    num_freq_tiles = n_freq_pad // TILE_K
    grid = (f_pad // TILE_F, num_freq_tiles)

    kernel = functools.partial(
        _stft_kernel,
        norm=_norm_consts(cfg),
        num_freq_tiles=num_freq_tiles,
        normalize_linear=normalize_linear,
    )

    lin, mel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_F, cfg.n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, TILE_K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, TILE_K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, n_mels_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_F, TILE_K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_F, n_mels_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_pad, n_freq_pad), jnp.float32),
            jax.ShapeDtypeStruct((f_pad, n_mels_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TILE_F, n_mels_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_pad * cfg.n_fft * n_freq_pad * 2
            + 2 * f_pad * n_freq_pad * n_mels_pad,
            bytes_accessed=4 * (
                f_pad * cfg.n_fft + 2 * cfg.n_fft * n_freq_pad
                + f_pad * n_freq_pad + f_pad * n_mels_pad
            ),
            transcendentals=f_pad * (n_freq_pad + n_mels_pad),
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_b))

    return (
        mel[:num_frames, : cfg.num_mels],
        lin[:num_frames, : cfg.num_freq],
    )


def _stft_fused_kernel(chunks_hbm, cos_ref, sin_ref, mel_ref,
                       lin_out_ref, mel_out_ref,
                       chunk_scr, frames_scr, mel_acc, dma_sem,
                       *, j0, j1, norm, num_freq_tiles, normalize_linear):
    """Framing fused INSIDE the kernel (VERDICT r2 #2a): each frame tile's
    hop-chunk rows are DMA'd from HBM once (at j==0), the overlapped
    (TILE_F, n_fft) frame matrix is assembled in VMEM from k shifted sublane
    slices, and reused across all freq tiles — the (B*T, n_fft) frames
    intermediate never exists in HBM (it cost the unfused kernel its lead
    over the conv-fused XLA path: 8 MB written + read per 1024 frames)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        # ONE tile-aligned DMA brings this tile's chunk rows into VMEM (HBM
        # slice starts at i*TILE_F — a sublane-tile boundary; per-shift DMA
        # starts i*TILE_F+jj fail Mosaic's divisible-by-8 proof), then k
        # shifted stores assemble the overlapped frame matrix: frame t =
        # chunks[t : t + k] flattened into the k hop-column blocks.
        # only the window's live taps [j0, j1) are assembled and multiplied:
        # with win_length < n_fft the padded Hann is zero on whole hop-chunks
        # (1024/2048/256 zeroes taps 0,1,6,7), and the matching basis rows
        # are zero — eliding them halves the matmul K dim exactly
        hop = frames_scr.shape[1] // (j1 - j0)
        dma = pltpu.make_async_copy(
            chunks_hbm.at[b, pl.ds(i * TILE_F, chunk_scr.shape[0]), :],
            chunk_scr, dma_sem,
        )
        dma.start()
        dma.wait()
        for jj in range(j0, j1):
            frames_scr[:, (jj - j0) * hop : (jj - j0 + 1) * hop] = (
                chunk_scr[jj : jj + TILE_F, :]
            )
        mel_acc[...] = jnp.zeros_like(mel_acc)

    frames = frames_scr[...].astype(cos_ref.dtype)
    real = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(real * real + imag * imag)

    if normalize_linear:
        lin_out_ref[0] = _db_normalize(mag, norm)
    else:
        lin_out_ref[0] = mag

    mel_acc[...] += jnp.dot(mag, mel_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(j == num_freq_tiles - 1)
    def _():
        mel_out_ref[0] = _db_normalize(mel_acc[...], norm)


def live_tap_span(cfg: AudioConfig) -> Tuple[int, int, int]:
    """(j0, j1, n_live): the hop-chunk span [j0, j1) of the padded window
    with any nonzero tap, and its sample count n_live = (j1-j0)*hop. This is
    THE live matmul-K dimension after zero-tap elision — the single source of
    truth shared by the fused kernel and the roofline FLOP accounting
    (ADVICE r3: a closed-form approximation overstated it by ~25% at
    production params, where win 1024 / fft 2048 / hop 256 gives exactly 4
    live chunks = 1024 samples, not 1280)."""
    cfg_hop, n_fft = cfg.hop_length, cfg.n_fft
    k = n_fft // cfg_hop
    win = padded_window(cfg.win_length, n_fft)
    live = [j for j in range(k)
            if np.any(win[j * cfg_hop: (j + 1) * cfg_hop] != 0.0)]
    j0, j1 = (live[0], live[-1] + 1) if live else (0, k)
    return j0, j1, (j1 - j0) * cfg_hop


def stft_features_pallas_fused(
    wav: jnp.ndarray,
    cfg: AudioConfig,
    *,
    normalize_linear: bool = True,
    interpret: bool = False,
    bf16_bases: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) ALREADY preemphasized + reflect-center-padded wav ->
    (mel (B, T, n_mels), linear (B, T, n_freq)), normalized dB.

    Same contract as JaxDSP.features_precentered, but the whole
    frame+window+DFT+mel+companding pipeline is ONE Pallas program with the
    framing done in VMEM (no frames intermediate in HBM). Requires
    hop | n_fft (the repo-wide framing invariant).

    bf16_bases (OPT-IN): DFT cos/sin bases and the frame operand feed the
    MXU in bfloat16 with float32 accumulation — 4x the f32 matmul rate on
    v5e and half the basis HBM traffic. Caveat measured on CPU parity: bins
    produced by heavy cancellation (near-silent frequencies) see up to
    ~0.04 absolute error in normalized-dB units (~4 dB on quiet bins;
    loud bins are ~1e-3-exact), so the default stays f32; enable for
    serving-style extraction where quiet-bin fidelity is irrelevant."""
    cfg_hop, n_fft = cfg.hop_length, cfg.n_fft
    assert n_fft % cfg_hop == 0, "hop must divide n_fft"
    k = n_fft // cfg_hop
    b, total = wav.shape
    num_frames = 1 + (total - n_fft) // cfg_hop

    cos_b, sin_b, mel_b, n_freq_pad = _bases(cfg)
    # live window taps (zero-tap elision; see _stft_fused_kernel)
    j0, j1, n_live = live_tap_span(cfg)
    cos_b = cos_b[j0 * cfg_hop: j1 * cfg_hop]
    sin_b = sin_b[j0 * cfg_hop: j1 * cfg_hop]
    t_pad = _round_up(max(num_frames, TILE_F), TILE_F)
    # chunk view must cover t_pad + k - 1 rows of hop samples; the per-tile
    # DMA slice size must be sublane-tile-aligned (Mosaic: multiple of 8),
    # so the overhang is rounded up from k-1 to k8
    k8 = _round_up(k - 1, 8)
    need = (t_pad + k8) * cfg_hop
    if need > total:
        wav = jnp.pad(wav, ((0, 0), (0, need - total)))
    chunks = wav[:, :need].reshape(b, t_pad + k8, cfg_hop)

    n_mels_pad = mel_b.shape[1]
    num_freq_tiles = n_freq_pad // TILE_K
    grid = (b, t_pad // TILE_F, num_freq_tiles)

    kernel = functools.partial(
        _stft_fused_kernel,
        j0=j0,
        j1=j1,
        norm=_norm_consts(cfg),
        num_freq_tiles=num_freq_tiles,
        normalize_linear=normalize_linear,
    )

    base_dt = jnp.bfloat16 if bf16_bases else jnp.float32
    lin, mel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # chunks stay in HBM
            pl.BlockSpec((n_live, TILE_K), lambda b_, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_live, TILE_K), lambda b_, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, n_mels_pad), lambda b_, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_F, TILE_K), lambda b_, i, j: (b_, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_F, n_mels_pad), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, n_freq_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, n_mels_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_F + k8, cfg_hop), jnp.float32),
            pltpu.VMEM((TILE_F, n_live), jnp.float32),
            pltpu.VMEM((TILE_F, n_mels_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * n_live * n_freq_pad * 2
            + 2 * b * t_pad * n_freq_pad * n_mels_pad,
            bytes_accessed=4 * (
                b * t_pad * cfg_hop + 2 * n_live * n_freq_pad
                + b * t_pad * (n_freq_pad + n_mels_pad)
            ),
            transcendentals=b * t_pad * (n_freq_pad + n_mels_pad),
        ),
        interpret=interpret,
    )(chunks, jnp.asarray(cos_b, base_dt), jnp.asarray(sin_b, base_dt),
      jnp.asarray(mel_b))

    return (
        mel[:, :num_frames, : cfg.num_mels],
        lin[:, :num_frames, : cfg.num_freq],
    )


def _stft_resident_kernel(chunks_hbm, cos_ref, sin_ref, mel_ref,
                          lin_out_ref, mel_out_ref,
                          chunk_scr, frames_scr, dma_sem,
                          *, j0, j1, norm, normalize_linear):
    """Whole-frequency STFT tile with VMEM-RESIDENT bases (r5).

    The r4 fused kernel re-fetched a (n_live, TILE_K) cos and sin block from
    HBM on EVERY grid step (freq innermost, block index (0, j) changes each
    step): at production dims that is ~1 MB/step x 288 steps = ~290 MB of
    basis traffic — 350 us at HBM peak, which matched the measured 346 us
    marginal almost exactly (KERNEL_BENCH_r04 stft_marginal_us). Here the
    bases are single blocks with a CONSTANT index map, so Pallas fetches
    them once and they stay resident in VMEM (~4.7 MB in bf16, ~9.4 MB f32);
    the freq dimension is processed whole per frame tile, which also deletes
    the mel accumulator and the @pl.when epilogue."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    tile_f = frames_scr.shape[0]
    hop = frames_scr.shape[1] // (j1 - j0)
    dma = pltpu.make_async_copy(
        chunks_hbm.at[b, pl.ds(i * tile_f, chunk_scr.shape[0]), :],
        chunk_scr, dma_sem,
    )
    dma.start()
    dma.wait()
    for jj in range(j0, j1):
        frames_scr[:, (jj - j0) * hop : (jj - j0 + 1) * hop] = (
            chunk_scr[jj : jj + tile_f, :]
        )
    frames = frames_scr[...].astype(cos_ref.dtype)
    real = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(real * real + imag * imag)

    if normalize_linear:
        lin_out_ref[0] = _db_normalize(mag, norm)
    else:
        lin_out_ref[0] = mag

    melv = jnp.dot(mag.astype(mel_ref.dtype), mel_ref[...],
                   preferred_element_type=jnp.float32)
    mel_out_ref[0] = _db_normalize(melv, norm)


def stft_features_pallas_resident(
    wav: jnp.ndarray,
    cfg: AudioConfig,
    *,
    normalize_linear: bool = True,
    interpret: bool = False,
    bf16: bool = False,
    tile_f: int = TILE_F,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) preemphasized + reflect-center-padded wav -> (mel, linear).

    Same contract and math as stft_features_pallas_fused, but the DFT/mel
    bases are VMEM-resident across the whole launch (see
    _stft_resident_kernel) and each grid step processes the FULL frequency
    axis of one (tile_f)-frame tile.

    bf16: feed the MXU bfloat16 operands with float32 accumulation — the
    same precision class as XLA's DEFAULT matmul precision on TPU (the
    conv-XLA production path's implicit setting), 4x the f32 MXU rate on
    v5e, and half the resident-basis VMEM footprint.
    """
    cfg_hop, n_fft = cfg.hop_length, cfg.n_fft
    assert n_fft % cfg_hop == 0, "hop must divide n_fft"
    k = n_fft // cfg_hop
    b, total = wav.shape
    num_frames = 1 + (total - n_fft) // cfg_hop

    cos_b, sin_b, mel_b, n_freq_pad = _bases(cfg)
    j0, j1, n_live = live_tap_span(cfg)
    cos_b = cos_b[j0 * cfg_hop: j1 * cfg_hop]
    sin_b = sin_b[j0 * cfg_hop: j1 * cfg_hop]
    t_pad = _round_up(max(num_frames, tile_f), tile_f)
    k8 = _round_up(k - 1, 8)
    need = (t_pad + k8) * cfg_hop
    if need > total:
        wav = jnp.pad(wav, ((0, 0), (0, need - total)))
    chunks = wav[:, :need].reshape(b, t_pad + k8, cfg_hop)

    n_mels_pad = mel_b.shape[1]
    grid = (b, t_pad // tile_f)

    kernel = functools.partial(
        _stft_resident_kernel,
        j0=j0,
        j1=j1,
        norm=_norm_consts(cfg),
        normalize_linear=normalize_linear,
    )

    base_dt = jnp.bfloat16 if bf16 else jnp.float32
    lin, mel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # chunks stay in HBM
            # constant index maps -> fetched once, resident for the launch
            pl.BlockSpec((n_live, n_freq_pad), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_live, n_freq_pad), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq_pad, n_mels_pad), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_f, n_freq_pad), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_f, n_mels_pad), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, n_freq_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, n_mels_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_f + k8, cfg_hop), jnp.float32),
            pltpu.VMEM((tile_f, n_live), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * n_live * n_freq_pad * 2
            + 2 * b * t_pad * n_freq_pad * n_mels_pad,
            bytes_accessed=4 * (
                b * t_pad * cfg_hop
                + b * t_pad * (n_freq_pad + n_mels_pad)
            ) + (2 if bf16 else 4) * (2 * n_live + n_mels_pad) * n_freq_pad,
            transcendentals=b * t_pad * (n_freq_pad + n_mels_pad),
        ),
        interpret=interpret,
    )(chunks, jnp.asarray(cos_b, base_dt), jnp.asarray(sin_b, base_dt),
      jnp.asarray(mel_b, base_dt))

    return (
        mel[:, :num_frames, : cfg.num_mels],
        lin[:, :num_frames, : cfg.num_freq],
    )


class PallasDSP:
    """Drop-in feature extractor using the fused kernel (TPU path).

    Mirrors JaxDSP.features: wav (B, S) -> (mel (B, T, n_mels),
    linear (B, T, n_freq)); preemphasis + framing reuse the jnp helpers.
    """

    def __init__(self, cfg: AudioConfig, interpret: bool = False):
        from ..dsp.jax_dsp import JaxDSP

        self.cfg = cfg
        self.interpret = interpret
        self._jdsp = JaxDSP(cfg)

    def features(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = wav.shape[0]
        frames = self._jdsp._frame(self._jdsp.preemphasis(wav))  # (B, T, n_fft)
        t = frames.shape[1]
        flat = frames.reshape(b * t, self.cfg.n_fft)
        mel, lin = stft_features_pallas(flat, self.cfg, interpret=self.interpret)
        return (
            mel.reshape(b, t, self.cfg.num_mels),
            lin.reshape(b, t, self.cfg.num_freq),
        )

    def mel_spectrogram(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self.features(wav)[0]

    def linear_spectrogram(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self.features(wav)[1]
