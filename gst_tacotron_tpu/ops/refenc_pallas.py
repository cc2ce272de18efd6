"""Pallas TPU kernel: the GST reference-encoder conv stack, fused.

Named per-chip speed-of-light target (BASELINE.json:5 "reference-encoder
conv stack"; SURVEY.md §2.1 "GST reference encoder"). The XLA im2col form
measured 2,281 us at (8, 256 frames) — 0.5% of SOL, all layout/transpose
traffic on tiny tensors across ~25 separate HLO ops (KERNEL_BENCH_r02.json).

Two fused forms, both running the WHOLE 6-layer stack in one program with
VMEM-resident intermediates and inference BN folded into a per-layer
scale/bias epilogue:

1. `refenc_stack_pallas` — one batch element per grid step; each 3x3
   stride-2 SAME conv is 9 tap-accumulated (HW, C_in)@(C_in, C_out) matmuls
   (patches from static strided VMEM slices). Works for any T; but the tiny
   matmul shapes cap MXU utilization at ~6%.
2. `refenc_stack_pallas_batched` — the production form for
   T % 2**n_layers == 0 (the Synthesizer pads ref mels to 64): the
   activation lives as ONE 2-D (B*Hp, Wp*C) array — batch+height fused into
   matmul rows, width+channels into lanes — and each layer is THREE matmuls
   (one per kernel-row phase) against precomputed block-banded matrices
   that fold the width-tap selection and the channel mix
   (build_refenc_bmats). Height taps are stride-2 sublane slices;
   per-element zero-pad rows halve layer-by-layer so they never need
   re-inserting, and a row-iota mask re-zeroes them after each epilogue.

Inference-only (BN folded from running stats; no VJP) — training keeps the
flax module path. A `gst_style_from_params` helper composes the kernel with
the Pallas GRU and the style-token attention math to produce the style
embedding straight from a GSTTacotron variables tree (the Synthesizer fast
path).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.modules import BN_EPS


def _out_hw(h: int, w: int) -> Tuple[int, int]:
    return (h + 1) // 2, (w + 1) // 2


def _stride2_slice(x, d: int, n_out: int, axis: int):
    """rows/cols d, d+2, ..., d+2*(n_out-1) of `x` along `axis` WITHOUT a
    strided slice (Mosaic lowers >2-D strided slices to gather, which is
    unsupported): contiguous slice -> split the axis into (n_out, 2) ->
    take phase 0."""
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(d, d + 2 * n_out)
    y = x[tuple(idx)]
    shape = list(y.shape)
    shape[axis : axis + 1] = [n_out, 2]
    y = y.reshape(shape)
    idx2 = [slice(None)] * y.ndim
    idx2[axis + 1] = 0
    return y[tuple(idx2)]


def _conv_bn_relu(x, wmat, scale, bias, c_in: int, c_out: int):
    """(H, W, C_in) -> (H', W', C_out): SAME 3x3 stride-2 im2col matmul with
    the folded-BN epilogue; pure jnp on VMEM values."""
    h, w = x.shape[0], x.shape[1]
    h_out, w_out = _out_hw(h, w)
    ph = max(0, (h_out - 1) * 2 + 3 - h)
    pw = max(0, (w_out - 1) * 2 + 3 - w)
    # extra bottom/right zero rows so _stride2_slice's CONTIGUOUS slice
    # (d .. d+2*n_out) never clamps at d=2; the extras only feed discarded
    # phase-1 lanes
    extra_h = (2 * h_out + 2) - (h + ph)
    extra_w = (2 * w_out + 2) - (w + pw)
    xp = jnp.pad(x, ((ph // 2, ph - ph // 2 + max(0, extra_h)),
                     (pw // 2, pw - pw // 2 + max(0, extra_w)),
                     (0, 0)))
    # tap accumulation instead of a 9C im2col concat: one strided slice live
    # at a time keeps the Mosaic scoped-VMEM footprint ~x + xp + one tap
    # (the concat form allocated 47 MB of stack at (8, 256, 80) — OOM)
    y = None
    for di in range(3):
        rows = _stride2_slice(xp, di, h_out, 0)
        for dj in range(3):
            xs = _stride2_slice(rows, dj, w_out, 1).reshape(
                h_out * w_out, c_in)
            wtap = wmat[(3 * di + dj) * c_in : (3 * di + dj + 1) * c_in]
            part = jnp.dot(xs, wtap, preferred_element_type=jnp.float32)
            y = part if y is None else y + part
    y = jnp.maximum(y * scale + bias, 0.0)
    return y.reshape(h_out, w_out, c_out)


def _conv_bn_relu_l0(x2, wmat, scale, bias, c_out: int):
    """First layer, C_in=1: keep the input 2-D (T, F) — a (T, F, 1) array
    wastes 128x VMEM on the padded lane dim (it OOM'd the scoped stack).
    Each tap is a broadcast multiply-accumulate of a shifted 2-D slice
    against the tap's (C_out,) weight row."""
    h, w = x2.shape
    h_out, w_out = _out_hw(h, w)
    ph = max(0, (h_out - 1) * 2 + 3 - h)
    pw = max(0, (w_out - 1) * 2 + 3 - w)
    extra_h = (2 * h_out + 2) - (h + ph)
    extra_w = (2 * w_out + 2) - (w + pw)
    xp = jnp.pad(x2, ((ph // 2, ph - ph // 2 + max(0, extra_h)),
                      (pw // 2, pw - pw // 2 + max(0, extra_w))))
    wp = xp.shape[1]
    # stride-2 on the LANE axis via a 0/1 selection matmul (a lane-splitting
    # reshape is the one shape cast Mosaic rejects — probed on-chip); the
    # selection matrices are built from iota, no extra kernel inputs
    rr = jax.lax.broadcasted_iota(jnp.int32, (wp, w_out), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (wp, w_out), 1)
    y = None
    for di in range(3):
        rows = _stride2_slice(xp, di, h_out, 0)  # sublane split: supported
        for dj in range(3):
            sel = (rr == 2 * cc + dj).astype(jnp.float32)
            xs = jnp.dot(rows, sel, preferred_element_type=jnp.float32)
            part = xs[:, :, None] * wmat[3 * di + dj][None, None, :]
            y = part if y is None else y + part
    y = jnp.maximum(y * scale[None] + bias[None], 0.0)
    return y  # (h_out, w_out, c_out)


def _refenc_kernel(x_ref, *refs, channels: Sequence[int], t_in: int,
                   f_in: int):
    """One batch element: x_ref block (1, T, F); refs = per-layer
    [wmat_0, scale_0, bias_0, ..., out_ref]."""
    out_ref = refs[-1]
    h, w = t_in, f_in
    x = _conv_bn_relu_l0(x_ref[0], refs[0][...], refs[1][...], refs[2][...],
                         channels[0])
    h, w = _out_hw(h, w)
    c_in = channels[0]
    for li, c_out in enumerate(channels[1:], start=1):
        wmat = refs[3 * li][...]
        scale = refs[3 * li + 1][...]   # (1, C_out)
        bias = refs[3 * li + 2][...]
        x = _conv_bn_relu(x, wmat, scale, bias, c_in, c_out)
        h, w = _out_hw(h, w)
        c_in = c_out
    out_ref[0] = x.reshape(h, w * c_in)


def fold_bn(bn_params: Dict[str, jnp.ndarray],
            bn_stats: Dict[str, jnp.ndarray]
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference BatchNorm -> (scale, bias) epilogue, Keras eps convention."""
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    return inv, bn_params["bias"] - bn_stats["mean"] * inv


# ---------------------------------------------------------------------------
# Batched whole-stack kernel: one program, batch folded into matmul rows.
#
# The per-element grid form above runs every conv as 9 tiny (HW, C_in)@(C_in,
# C_out) matmuls — at C=32 that is 25% lane and 25% K utilization of the MXU
# (~6% total), and the VPU pays 6 layers x 9 taps x B grid steps of slice
# traffic; it measured 1,741 us at (8, 256, 80), barely ahead of XLA's 2,255
# (KERNEL_BENCH_r03). This form instead keeps the activation as ONE 2-D VMEM
# array of shape (B*Hp, Wp*C) — batch and height fused into matmul rows,
# width and channels fused into lanes — and runs each layer as THREE matmuls
# (one per kernel-row phase di) against precomputed block-banded matrices
# M_di[(2q+dj-pl)*C_in + ci, q*C_out + co] = K[di, dj, ci, co] that fold the
# width-tap selection AND the channel mix (same trick as the decode kernel's
# banded-Toeplitz location term). The height taps come from stride-2 sublane
# slices; per-element zero pad rows halve layer-by-layer so they never need
# re-inserting. Zero rows/lanes are carried exactly: the folded-BN epilogue
# vectors are zeroed on pad lanes and a row iota mask re-zeroes pad rows that
# a matmul touched (an epilogue bias would otherwise leak relu(bias) into
# them).
# ---------------------------------------------------------------------------


def _refenc_layout(t: int, f: int, channels: Sequence[int]):
    """Static layout plan. Requires t % 2**n_layers == 0 (every intermediate
    height even -> SAME padding never pads on top; use
    refenc_batched_supported to gate)."""
    n = len(channels)
    assert t % (1 << n) == 0, "batched refenc kernel needs t % 2**layers == 0"
    plan = []
    h, w = t, f
    hp = t + (1 << n)          # per-element rows incl. zero pad (halves/layer)
    c_in = 1
    wp_in = f + 1              # lane slots per width position (>= w+1)
    for li, c_out in enumerate(channels):
        h_out, w_out = _out_hw(h, w)
        # SAME width padding: left pad only when w is odd
        pl_w = ((w_out - 1) * 2 + 3 - w) // 2 if w % 2 else 0
        wp_out = w_out if li == n - 1 else w_out + 1
        plan.append(dict(h_in=h, w_in=w, hp_in=hp, c_in=c_in, wp_in=wp_in,
                         h_out=h_out, w_out=w_out, hp_out=hp // 2,
                         c_out=c_out, wp_out=wp_out, pl_w=pl_w))
        h, w, hp, c_in, wp_in = h_out, w_out, hp // 2, c_out, wp_out
    return plan


def refenc_batched_supported(t: int, n_layers: int) -> bool:
    return t % (1 << n_layers) == 0


_BATCHED_VMEM_LIMIT = 100 * 1024 * 1024  # matches the pallas_call param


def refenc_batched_vmem_ok(b: int, t: int, f: int,
                           channels: Sequence[int]) -> bool:
    """Whether the whole-batch form's scoped-VMEM peak fits. The kernel
    keeps x, the 8-row-padded copy, the accumulating layer output, and all
    phase matrices live; at large B*t this exceeds the 100 MB scoped limit
    (measured: OOM at B=64, t=128, f=80 — 125.5 MB), in which case the
    per-element grid form is the fallback."""
    plan = _refenc_layout(t, f, channels)
    mats = 0
    peak = 0
    for lp in plan:
        li = (lp["wp_in"] * lp["c_in"], lp["wp_out"] * lp["c_out"])
        mats += 3 * li[0] * li[1] + 2 * li[1]
        x_in = (b * lp["hp_in"] + 8) * li[0] * 2  # x + padded copy
        x_out = b * lp["hp_out"] * li[1] * 2      # acc + masked result
        peak = max(peak, x_in + x_out)
    return 4 * (mats + peak) < _BATCHED_VMEM_LIMIT * 0.9


def build_refenc_bmats(conv_kernels, bn_scales, bn_biases, t: int, f: int):
    """Per layer: 3 phase matrices (Lp_in, Lp_out) + epilogue vectors
    (1, Lp_out). Traceable (jnp on the weights, static numpy placement)."""
    channels = [int(k.shape[-1]) for k in conv_kernels]
    plan = _refenc_layout(t, f, channels)
    out = []
    for li, (kern, sc, bi, lp) in enumerate(
            zip(conv_kernels, bn_scales, bn_biases, plan)):
        c_in, c_out = lp["c_in"], lp["c_out"]
        wp_in, wp_out, w_in, w_out = (lp["wp_in"], lp["wp_out"],
                                      lp["w_in"], lp["w_out"])
        # static placement: P[dj, u, q] = 1 iff u = 2q + dj - pl_w hits real
        # input width u < w_in for output position q < w_out
        P = np.zeros((3, wp_in, wp_out), np.float32)
        for dj in range(3):
            for q in range(w_out):
                u = 2 * q + dj - lp["pl_w"]
                if 0 <= u < w_in:
                    P[dj, u, q] = 1.0
        k = jnp.asarray(kern, jnp.float32)                 # (3, 3, Cin, Cout)
        ms = []
        for di in range(3):
            m = jnp.einsum("juq,jio->uiqo", jnp.asarray(P), k[di])
            ms.append(m.reshape(wp_in * c_in, wp_out * c_out))
        wmask = (np.arange(wp_out) < w_out).astype(np.float32)
        sv = (jnp.asarray(wmask)[:, None]
              * jnp.asarray(sc, jnp.float32).reshape(-1)[None, :]
              ).reshape(1, wp_out * c_out)
        bv = (jnp.asarray(wmask)[:, None]
              * jnp.asarray(bi, jnp.float32).reshape(-1)[None, :]
              ).reshape(1, wp_out * c_out)
        out.append((ms[0], ms[1], ms[2], sv, bv))
    return out, plan


def _refenc_batched_kernel(x_ref, *refs, plan, b: int, bf16: bool):
    out_ref = refs[-1]
    x = x_ref[...]
    for li, lp in enumerate(plan):
        m0, m1, m2, sv, bv = (r[...] for r in refs[5 * li: 5 * li + 5])
        # pad 8 zero rows: 2 are needed so the di=2 contiguous slice never
        # clamps; the count is rounded up to 8 for sublane-tile alignment
        # (Mosaic requires 8-row-aligned slice extents — do NOT shrink to 2)
        xp = jnp.pad(x, ((0, 8), (0, 0)))
        if bf16:
            # bf16 operands, f32 accumulation: the kernel is compute-bound
            # on its own deliberately-inflated dense-banded FLOPs (see
            # refenc_stack_pallas_batched docstring), so doubling the MXU
            # rate is the one lever left; activations are post-relu/BN
            # magnitudes where bf16's ~3 decimal digits hold ~1e-2 relative
            xp = xp.astype(jnp.bfloat16)
        n_rows = b * lp["hp_out"]
        acc = None
        for di, m in enumerate((m0, m1, m2)):
            rows = _stride2_slice(xp, di, n_rows, 0)     # (n_rows, Lp_in)
            part = jnp.dot(rows, m.astype(xp.dtype),
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        y = jnp.maximum(acc * sv + bv, 0.0)
        # re-zero per-element pad rows (and the cross-element leak row):
        # row r belongs to element r // hp_out at position r % hp_out
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        pos = r_idx - (r_idx // lp["hp_out"]) * lp["hp_out"]
        x = y * (pos < lp["h_out"]).astype(jnp.float32)
    last = plan[-1]
    hp, h = last["hp_out"], last["h_out"]
    for bb in range(b):
        out_ref[bb] = x[bb * hp: bb * hp + h]


def refenc_stack_pallas_batched(
    ref_mel: jnp.ndarray,
    conv_kernels: Sequence[jnp.ndarray],
    bn_scales: Sequence[jnp.ndarray],
    bn_biases: Sequence[jnp.ndarray],
    *,
    interpret: bool = False,
    bf16: bool = False,
) -> jnp.ndarray:
    """(B, T, F) masked ref mel -> (B, T', F'*C_last); numerics identical to
    refenc_stack_pallas / models/gst.py::ReferenceEncoder (bf16=True trades
    ~1e-2 relative activation error for the doubled MXU rate — opt-in, see
    _refenc_batched_kernel). Requires T % 2**n_layers == 0."""
    b, t, f = ref_mel.shape
    channels = [int(k.shape[-1]) for k in conv_kernels]
    mats, plan = build_refenc_bmats(conv_kernels, bn_scales, bn_biases, t, f)
    lp0, lpL = plan[0], plan[-1]

    # host/XLA-side input prep: per-element zero pad rows + lane pad
    x0 = jnp.pad(ref_mel.astype(jnp.float32),
                 ((0, 0), (0, lp0["hp_in"] - t), (0, lp0["wp_in"] - f)))
    x0 = x0.reshape(b * lp0["hp_in"], lp0["wp_in"])

    args, in_specs = [], [
        pl.BlockSpec(x0.shape, lambda: (0, 0), memory_space=pltpu.VMEM)]
    for layer in mats:
        for i, a in enumerate(layer):
            if bf16 and i < 3:
                # phase matrices shipped bf16: halves their HBM traffic
                # (~23 MB of the design's ~24 MB total) AND feeds the MXU
                # its double-rate input dtype; epilogue stays f32
                a = a.astype(jnp.bfloat16)
            args.append(a)
            in_specs.append(pl.BlockSpec(
                a.shape, lambda *_, n=a.ndim: (0,) * n,
                memory_space=pltpu.VMEM))

    flops = 0
    for lp in plan:
        flops += 3 * 2 * (b * lp["hp_out"]) * (lp["wp_in"] * lp["c_in"]) \
            * (lp["wp_out"] * lp["c_out"])
    out_w = lpL["wp_out"] * lpL["c_out"]
    mat_bytes = sum(int(np.prod(a.shape)) for layer in mats for a in layer)
    out = pl.pallas_call(
        functools.partial(_refenc_batched_kernel, plan=plan, b=b, bf16=bf16),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, lpL["h_out"], out_w), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lpL["h_out"], out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # resident phase matrices (~30 MB) + layer-chain intermediates
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (int(np.prod(x0.shape)) + mat_bytes
                                + b * lpL["h_out"] * out_w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x0, *args)
    return out


def refenc_stack_pallas(
    ref_mel: jnp.ndarray,
    conv_kernels: Sequence[jnp.ndarray],
    bn_scales: Sequence[jnp.ndarray],
    bn_biases: Sequence[jnp.ndarray],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, F) masked ref mel -> (B, T', F'*C_last) conv-stack features.

    conv_kernels[i] is the flax (3, 3, C_in, C_out) kernel; BN already
    folded to (scale, bias) per layer (fold_bn)."""
    b, t, f = ref_mel.shape
    channels = [int(k.shape[-1]) for k in conv_kernels]
    h, w = t, f
    for _ in channels:
        h, w = _out_hw(h, w)
    out_w = w * channels[-1]

    args = []
    in_specs = [pl.BlockSpec((1, t, f), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for kern, sc, bi in zip(conv_kernels, bn_scales, bn_biases):
        c_in, c_out = int(kern.shape[2]), int(kern.shape[3])
        # (3, 3, C_in, C_out) -> (9*C_in, C_out) in the patch concat order
        args.append(kern.astype(jnp.float32).reshape(9 * c_in, c_out))
        args.append(sc.astype(jnp.float32).reshape(1, c_out))
        args.append(bi.astype(jnp.float32).reshape(1, c_out))
        for shape in ((9 * c_in, c_out), (1, c_out), (1, c_out)):
            in_specs.append(
                pl.BlockSpec(shape, lambda i, n=len(shape): (0,) * n,
                             memory_space=pltpu.VMEM))

    kernel = functools.partial(_refenc_kernel, channels=channels,
                               t_in=t, f_in=f)
    flops = 0
    hh, ww, ci = t, f, 1
    for c_out in channels:
        ho, wo = _out_hw(hh, ww)
        flops += 2 * ho * wo * 9 * ci * c_out
        hh, ww, ci = ho, wo, c_out
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the layer chain's live intermediates exceed the 16 MB default
            # scoped-stack budget at (256, 80) inputs; v5e VMEM is far larger
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=4 * (b * t * f + b * h * out_w)
            + 4 * sum(int(np.prod(k.shape)) for k in conv_kernels),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ref_mel.astype(jnp.float32), *args)
    return out


def ref_encoder_pallas(
    params: Dict, batch_stats: Dict, gst_cfg, ref_mel: jnp.ndarray,
    mel_lengths: Optional[jnp.ndarray] = None, *, interpret: bool = False,
    use_pallas_gru: bool = True, batched: Optional[bool] = None,
    bf16: Optional[bool] = None,
) -> jnp.ndarray:
    """ReferenceEncoder forward from raw variables (inference): fused conv
    stack kernel + GRU -> (B, ref_gru_dim) reference embedding. Numerics
    mirror models/gst.py::ReferenceEncoder (cited there; SURVEY.md §2.1).

    bf16=None (auto) enables bf16 phase-matrix operands for the batched
    kernel on TPU (VERDICT r4 #3: measured 131 us vs 224 us f32 at
    (8, 256, 80), KERNEL_BENCH_r04 ref_encoder_marginal_us; ~1e-2 relative
    activation error through the downstream 128-dim GRU + softmax style
    attention — on-chip parity gate in tpu_tests/test_kernels_tpu.py)."""
    n_layers = len(gst_cfg.ref_conv_channels)
    if mel_lengths is not None:
        tmask = (jnp.arange(ref_mel.shape[1])[None, :]
                 < mel_lengths[:, None]).astype(ref_mel.dtype)
        ref_mel = ref_mel * tmask[:, :, None]
    kernels = [params[f"conv_{i}"]["kernel"] for i in range(n_layers)]
    scales, biases = [], []
    for i in range(n_layers):
        sc, bi = fold_bn(params[f"bn_{i}"], batch_stats[f"bn_{i}"])
        scales.append(sc)
        biases.append(bi)
    if batched is None:
        batched = (
            refenc_batched_supported(ref_mel.shape[1], n_layers)
            and refenc_batched_vmem_ok(
                ref_mel.shape[0], ref_mel.shape[1], ref_mel.shape[2],
                list(gst_cfg.ref_conv_channels))
        )
    if bf16 is None:
        bf16 = jax.default_backend() not in ("cpu",)
    if batched:
        # whole-batch 3-matmul-per-layer form (see KERNEL_BENCH refenc rows
        # for the measured on-chip advantage over the per-element grid form)
        feats = refenc_stack_pallas_batched(ref_mel, kernels, scales, biases,
                                            interpret=interpret, bf16=bf16)
    else:
        feats = refenc_stack_pallas(ref_mel, kernels, scales, biases,
                                    interpret=interpret)  # (B, T', F'C)

    stride_total = 2 ** n_layers
    gru_lengths = None
    if mel_lengths is not None:
        gru_lengths = jnp.maximum(
            1, (mel_lengths + stride_total - 1) // stride_total)
    g = params["gru"]
    if use_pallas_gru and not interpret:
        from .gru_pallas import gru_scan_pallas

        _, final = gru_scan_pallas(
            feats, jnp.zeros((feats.shape[0], g["recurrent_kernel"].shape[0]),
                             jnp.float32),
            g["kernel"].astype(jnp.float32), g["bias"].astype(jnp.float32),
            g["recurrent_kernel"].astype(jnp.float32),
            g["recurrent_bias"].astype(jnp.float32),
            lengths=gru_lengths,
        )
        return final
    # jnp scan fallback (CPU / interpret parity)
    from ..models.rnn import GRU

    _, final = GRU(g["recurrent_kernel"].shape[0], allow_pallas=False).apply(
        {"params": g}, feats, gru_lengths)
    return final


def gst_style_from_params(
    variables: Dict, gst_cfg, ref_mel: Optional[jnp.ndarray],
    mel_lengths: Optional[jnp.ndarray] = None,
    token_weights: Optional[jnp.ndarray] = None, *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full GST block from a GSTTacotron variables tree (inference fast
    path): fused-kernel reference encoder + style-token multi-head attention
    (models/gst.py::StyleTokenLayer math)."""
    gp = variables["params"]["gst"]
    c = gst_cfg
    head_dim = c.style_dim // c.num_heads
    if ref_mel is None:
        assert token_weights is not None
        ref = jnp.zeros((token_weights.shape[0], c.ref_gru_dim), jnp.float32)
    else:
        ref = ref_encoder_pallas(
            gp["reference_encoder"],
            variables["batch_stats"]["gst"]["reference_encoder"],
            c, ref_mel, mel_lengths, interpret=interpret,
        )
    stl = gp["stl"]
    keys_base = jnp.tanh(stl["tokens"])
    q = ref @ stl["query_proj"]["kernel"]
    k = keys_base @ stl["key_proj"]["kernel"]
    v = keys_base @ stl["value_proj"]["kernel"]
    b = q.shape[0]
    q = q.reshape(b, c.num_heads, head_dim)
    k = k.reshape(c.num_tokens, c.num_heads, head_dim)
    v = v.reshape(c.num_tokens, c.num_heads, head_dim)
    scores = jnp.einsum("bhd,nhd->bhn", q, k) / np.sqrt(head_dim)
    attn = jax.nn.softmax(scores, axis=-1)
    if token_weights is not None:
        attn = jnp.broadcast_to(
            token_weights[:, None, :].astype(attn.dtype), attn.shape)
    style = jnp.einsum("bhn,nhd->bhd", attn, v).reshape(b, c.style_dim)
    return style, attn
