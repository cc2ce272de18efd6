"""Pallas TPU kernel: the WHOLE autoregressive decode loop in one kernel.

Named speed-of-light target (BASELINE.json:5 "autoregressive decode-step
kernels at speed-of-light per chip"; SURVEY.md §2.2 "fused decode-step kernel
inside lax.scan").

Why a mega-kernel instead of a per-step kernel: the decode step is ~10 small
matmuls over ~7 MB of weights. Under `lax.scan`, XLA re-reads every weight
from HBM each step, so the per-step floor is weight-bytes / HBM-bandwidth
(~9 us) no matter how small the batch. This kernel instead runs the FULL
fixed-length decode as a 1-D "arbitrary" grid (one grid step = one decoder
step) with every weight block mapped at a constant index — Pallas keeps them
resident in VMEM across grid steps, so steady-state per-step cost is pure
compute + the tiny per-step output write. Recurrent state (attention RNN,
two decoder GRUs, context, last frame) lives in VMEM scratch, which also
persists across grid steps.

Scope: Bahdanau AND location-sensitive attention, fixed-length decode,
reduction factor r (incl. r=1, config 3), optional always-on prenet dropout
via the on-core PRNG (a different stream than jax.random — statistically
equivalent, bit-different; parity tests run with dropout off).

Location-sensitive path (SURVEY.md §7 hard part 3 "per-step conv over
accumulated alignments without re-materializing history"): the previous and
cumulative alignments live in VMEM scratch; the 31-tap location conv and the
location projection are FOLDED into one (k*c, A) tap matrix at pack time
(both are bias-free linear maps), then expanded by the wrapper into a
banded-Toeplitz constant wloc (loc_c*T, T*A) so the whole per-step location
term is ONE MXU matmul [prev ; cum] @ wloc — no per-tap VPU traffic, no HBM
traffic for alignment history. When wloc would exceed the VMEM budget
(long texts), a per-tap `pltpu.roll` fallback runs instead.

Shapes (padded by the wrapper):
  B -> multiple of 8 (sublanes), T_memory -> multiple of 128 (lanes),
  frame/stop outputs packed into one (S, B, 256) buffer
  [0:r*num_mels] = frames, [r*num_mels : r*num_mels + r] = stop logits.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AttentionConfig, DecoderConfig

LANE = 128
SUB = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gru(x, h, wi, bi, wh, bh):
    """Keras-v2 (reset_after) GRU step; returns new h. All f32 in VMEM."""
    gx = jnp.dot(x, wi, preferred_element_type=jnp.float32) + bi
    gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
    hdim = h.shape[-1]
    xz, xr, xn = gx[:, :hdim], gx[:, hdim:2 * hdim], gx[:, 2 * hdim:]
    hz, hr, hn = gh[:, :hdim], gh[:, hdim:2 * hdim], gh[:, 2 * hdim:]
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return z * h + (1.0 - z) * n


def _dropout(x, rate):
    """Inverted dropout from the on-core PRNG (seeded per step outside).

    `prng_random_bits` returns SIGNED int32 (uniform over the full 2^32
    range). Threshold in the signed domain: P(bits >= T) = 1 - rate gives
    T = (2*rate - 1) * 2^31. (The earlier uint32 threshold compared against
    signed bits and kept ~nothing — caught by the on-chip seed-variation
    test, TPU_TEST_r03.)"""
    bits = pltpu.prng_random_bits(x.shape)  # int32
    threshold = np.int32(
        max(-(2 ** 31), min(2 ** 31 - 1, round((2.0 * rate - 1.0) * 2 ** 31))))
    keep = bits >= threshold
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _decode_kernel(
    # scalar prefetch
    seed_ref,
    # inputs (constant index maps -> VMEM-resident across the grid)
    memory_ref, keys_ref, mask_ref,
    pw1_ref, pb1_ref, pw2_ref, pb2_ref,            # prenet
    awi_ref, abi_ref, awh_ref, abh_ref,            # attention GRU
    qproj_ref, vvec_ref, loca_ref, wloc_ref,       # attention score (+loc taps)
    dwi_ref, dbi_ref,                              # decoder input proj
    g1wi_ref, g1bi_ref, g1wh_ref, g1bh_ref,        # decoder GRU 1
    g2wi_ref, g2bi_ref, g2wh_ref, g2bh_ref,        # decoder GRU 2
    fw_ref, fb_ref,                                # fused frame+stop proj
    # outputs
    out_ref, align_ref,
    # scratch (persists across grid steps)
    h_attn, h_d1, h_d2, context, last_frame, prev_align, cum_align,
    *, num_mels: int, r: int, prenet_dims: Tuple[int, int],
    dropout_rate: float, use_dropout: bool,
    use_lsa: bool, loc_k: int, loc_c: int, lsa_matmul: bool,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_attn[...] = jnp.zeros_like(h_attn)
        h_d1[...] = jnp.zeros_like(h_d1)
        h_d2[...] = jnp.zeros_like(h_d2)
        context[...] = jnp.zeros_like(context)
        last_frame[...] = jnp.zeros_like(last_frame)
        # standard attention-state init: alignment = delta on position 0
        t_cols = jax.lax.broadcasted_iota(
            jnp.int32, prev_align.shape, dimension=1)
        prev_align[...] = (t_cols == 0).astype(jnp.float32)
        cum_align[...] = jnp.zeros_like(cum_align)

    if use_dropout:
        pltpu.prng_seed(seed_ref[0] + step)

    # prenet (last_frame cols >= num_mels are zero; pw1 rows >= num_mels zero)
    x = last_frame[...]
    h1 = jnp.maximum(
        jnp.dot(x, pw1_ref[...], preferred_element_type=jnp.float32)
        + pb1_ref[...], 0.0)
    if use_dropout:
        h1 = _dropout(h1, dropout_rate)
    h2 = jnp.maximum(
        jnp.dot(h1, pw2_ref[...], preferred_element_type=jnp.float32)
        + pb2_ref[...], 0.0)
    if use_dropout:
        h2 = _dropout(h2, dropout_rate)

    # attention GRU over [prenet_out ; context]
    attn_in = jnp.concatenate([h2, context[...]], axis=-1)
    h_attn_new = _gru(attn_in, h_attn[...], awi_ref[...], abi_ref[...],
                      awh_ref[...], abh_ref[...])
    h_attn[...] = h_attn_new

    # scores: v . tanh(keys + W_q q [+ folded location taps])
    q = jnp.dot(h_attn_new, qproj_ref[...], preferred_element_type=jnp.float32)
    tanh_arg = keys_ref[...] + q[:, None, :]                 # (B, T, A)
    if use_lsa and lsa_matmul:
        # per-step location term: loc[b,t,:] = Σ_{j,c} feats[b, t+j-pad_l, c]
        # * A[j*loc_c + c, :]. The whole term is ONE MXU matmul against a
        # banded-Toeplitz constant built by the wrapper:
        # wloc[c*T + u, t*A + a] = A[(u-t+pad_l)*loc_c + c, a] (0 off-band),
        # so loc2d = [prev ; cum] @ wloc, then a minor-dim-split reshape
        # (B, T*A) -> (B, T, A) (verified supported + order-exact on Mosaic).
        # The per-tap VPU variants (62 shifted outer-product FMAs, or a
        # 62-piece lane concat feeding a (B*T, 62) matmul) both measured
        # ~50 us/step at config 3 — the VPU tap traffic, not the math, was
        # the cost; this form is pure MXU.
        bsz, t_len = prev_align.shape
        a_dim = keys_ref.shape[-1]
        feat = prev_align[...]
        if loc_c == 2:
            feat = jnp.concatenate([feat, cum_align[...]], axis=1)
        loc2d = jnp.dot(feat, wloc_ref[...],
                        preferred_element_type=jnp.float32)   # (B, T*A)
        tanh_arg = tanh_arg + loc2d.reshape(bsz, t_len, a_dim)
    elif use_lsa:
        # Fallback when wloc (O(loc_c * T^2 * A) bytes) would not fit VMEM:
        # shifted (B, T) taps via cyclic `pltpu.roll` (zero-offset layout;
        # lane-offset slices of a padded concat hit Mosaic "Unsupported
        # reshape" on the (B,T,1) rank-expand) with an iota mask zeroing the
        # wrapped edge, stacked into ONE (B*T, k*c) matrix and contracted
        # against the folded (k*c, A) tap matrix on the MXU.
        pad_l = (loc_k - 1) // 2
        bsz, t_len = prev_align.shape
        t_cols = jax.lax.broadcasted_iota(
            jnp.int32, prev_align.shape, dimension=1)
        feats = [prev_align[...]]
        if loc_c == 2:
            feats.append(cum_align[...])
        loca = loca_ref[...]                                 # (k*c, A)
        taps = []
        for j in range(loc_k):
            shift = (pad_l - j) % t_len   # tap[b,t] = feat[b, t + j - pad_l]
            src = t_cols + (j - pad_l)
            valid = ((src >= 0) & (src < t_len)).astype(jnp.float32)
            for c in range(loc_c):
                taps.append(
                    (pltpu.roll(feats[c], shift, axis=1) * valid)[:, :, None])
        taps = jnp.concatenate(taps, axis=2)                 # (B, T, k*c)
        loc = jnp.dot(taps.reshape(bsz * t_len, loc_k * loc_c), loca,
                      preferred_element_type=jnp.float32)    # MXU
        tanh_arg = tanh_arg + loc.reshape(bsz, t_len, loca.shape[1])
    tanh_arg = jnp.tanh(tanh_arg)
    scores = jnp.sum(tanh_arg * vvec_ref[...][None, None, :], axis=-1)  # (B, T)
    scores = jnp.where(mask_ref[...] > 0.5, scores, -1e9)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * (mask_ref[...] > 0.5)
    align = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-9)  # (B, T)
    if use_lsa:
        prev_align[...] = align
        cum_align[...] = cum_align[...] + align

    # context: sum_t align[b,t] * memory[b,t,:]. NOTE: Mosaic cannot lower a
    # batched dot_general with a rank-2 lhs (parse error on
    # lhs_non_contracting_dims=[]), so use the multiply-reduce form — (B,T,M)
    # elementwise + reduction over T on the VPU, tiny at these shapes.
    ctx = jnp.sum(align[:, :, None] * memory_ref[...], axis=1)  # (B, M)
    context[...] = ctx

    # decoder input projection + 2 residual GRUs
    dec_in = jnp.concatenate([h_attn_new, ctx], axis=-1)
    h = jnp.dot(dec_in, dwi_ref[...], preferred_element_type=jnp.float32) \
        + dbi_ref[...]
    h1d = _gru(h, h_d1[...], g1wi_ref[...], g1bi_ref[...], g1wh_ref[...],
               g1bh_ref[...])
    h_d1[...] = h1d
    h = h + h1d
    h2d = _gru(h, h_d2[...], g2wi_ref[...], g2bi_ref[...], g2wh_ref[...],
               g2bh_ref[...])
    h_d2[...] = h2d
    h = h + h2d

    # fused frame+stop projection: (B, dec+M) @ (dec+M, 256)
    proj_in = jnp.concatenate([h, ctx], axis=-1)
    out = jnp.dot(proj_in, fw_ref[...], preferred_element_type=jnp.float32) \
        + fb_ref[...]                                         # (B, 256)

    out_ref[0] = out
    align_ref[0] = align

    # carry the last emitted frame into the next step's prenet input
    nf = last_frame.shape[-1]
    frame_start = (r - 1) * num_mels
    lf = out[:, frame_start : frame_start + num_mels]
    pad = jnp.zeros((lf.shape[0], nf - num_mels), jnp.float32)
    last_frame[...] = jnp.concatenate([lf, pad], axis=-1)


def decode_pallas_supported(model_cfg) -> bool:
    """True iff the fused decode kernel covers this model config.

    The kernel hardcodes the flagship decoder shape (2 decoder GRUs, 2-layer
    prenet, packed 256-lane output); out-of-scope configs must use the XLA
    scan path — callers gate on this instead of silently dropping layers.
    """
    d = model_cfg.decoder
    return (
        model_cfg.attention.kind in ("bahdanau", "location_sensitive")
        and d.num_decoder_rnn_layers == 2
        and len(d.prenet_dims) == 2
        and d.reduction_factor * model_cfg.num_mels + d.reduction_factor
        <= 2 * LANE
    )


def pack_decoder_weights(cell_params: Dict[str, Any], num_mels: int, r: int,
                         prenet_dims: Tuple[int, int]):
    """Pad/pack the flax DecoderCell param tree into kernel operand layout.

    Host-side, once per checkpoint: returns a dict of numpy arrays that
    `decode_scan_pallas` accepts (it is itself fully jittable)."""
    p = cell_params
    assert len(prenet_dims) == 2, "kernel covers the 2-layer prenet"
    assert "decoder_rnn_2" not in p, (
        "kernel covers exactly 2 decoder GRU layers; gate with "
        "decode_pallas_supported() before packing"
    )
    nf_pad = LANE  # padded last_frame/prenet input width

    pw1 = np.zeros((nf_pad, prenet_dims[0]), np.float32)
    pw1[:num_mels] = np.asarray(p["prenet"]["dense_0"]["kernel"])
    pb1 = np.asarray(p["prenet"]["dense_0"]["bias"])
    pw2 = np.asarray(p["prenet"]["dense_1"]["kernel"])
    pb2 = np.asarray(p["prenet"]["dense_1"]["bias"])

    awi = np.asarray(p["attention_rnn"]["kernel"])
    abi = np.asarray(p["attention_rnn"]["bias"])
    awh = np.asarray(p["attention_rnn"]["recurrent_kernel"])
    abh = np.asarray(p["attention_rnn"]["recurrent_bias"])

    qproj = np.asarray(p["attention"]["query_proj"]["kernel"])
    vvec = np.asarray(p["attention"]["score_v"]["kernel"])[:, 0]
    # Location-sensitive: fold conv (k, c, F) and projection (F, A) — both
    # bias-free linear maps — into one (k*c, A) tap matrix, matching
    # MatmulConv1D's x_cat row order (shift-major, channel-minor).
    loca = np.zeros((1, qproj.shape[1]), np.float32)
    if "location_conv" in p["attention"]:
        conv_k = np.asarray(p["attention"]["location_conv"]["kernel"])
        proj_k = np.asarray(p["attention"]["location_proj"]["kernel"])
        k, c, f = conv_k.shape
        loca = conv_k.reshape(k * c, f) @ proj_k            # (k*c, A)

    dwi = np.asarray(p["decoder_input_proj"]["kernel"])
    dbi = np.asarray(p["decoder_input_proj"]["bias"])

    g1 = p["decoder_rnn_0"]
    g2 = p["decoder_rnn_1"]

    frame_k = np.asarray(p["frame_proj"]["kernel"])    # (D, r*M)
    frame_b = np.asarray(p["frame_proj"]["bias"])
    stop_k = np.asarray(p["stop_proj"]["kernel"])      # (D, r)
    stop_b = np.asarray(p["stop_proj"]["bias"])
    dproj = frame_k.shape[0]
    out_dim = 2 * LANE  # 256 packed output lanes
    assert r * num_mels + r <= out_dim, "packed output exceeds 256 lanes"
    fw = np.zeros((dproj, out_dim), np.float32)
    fb = np.zeros((out_dim,), np.float32)
    fw[:, : r * num_mels] = frame_k
    fb[: r * num_mels] = frame_b
    fw[:, r * num_mels : r * num_mels + r] = stop_k
    fb[r * num_mels : r * num_mels + r] = stop_b

    return dict(
        pw1=pw1, pb1=pb1, pw2=pw2, pb2=pb2,
        awi=awi, abi=abi, awh=awh, abh=abh,
        qproj=qproj, vvec=vvec, loca=loca, dwi=dwi, dbi=dbi,
        g1wi=np.asarray(g1["kernel"]), g1bi=np.asarray(g1["bias"]),
        g1wh=np.asarray(g1["recurrent_kernel"]),
        g1bh=np.asarray(g1["recurrent_bias"]),
        g2wi=np.asarray(g2["kernel"]), g2bi=np.asarray(g2["bias"]),
        g2wh=np.asarray(g2["recurrent_kernel"]),
        g2bh=np.asarray(g2["recurrent_bias"]),
        fw=fw, fb=fb,
    )


def decode_scan_pallas(
    packed_weights: Dict[str, np.ndarray],
    memory: jnp.ndarray,            # (B, T, M)
    keys: jnp.ndarray,              # (B, T, A)
    memory_mask: jnp.ndarray,       # (B, T) bool/int
    *,
    dec_cfg: DecoderConfig,
    attn_cfg: AttentionConfig,
    num_mels: int,
    steps: int,
    seed: int = 0,
    use_dropout: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused fixed-length decode. Returns (mel (B, S*r, M_mel),
    stop_logits (B, S*r), alignments (B, S, T))."""
    assert attn_cfg.kind in ("bahdanau", "location_sensitive")
    use_lsa = attn_cfg.kind == "location_sensitive"
    loc_c = (2 if attn_cfg.cumulative else 1) if use_lsa else 1
    loc_k = attn_cfg.location_kernel_size if use_lsa else 1
    r = dec_cfg.reduction_factor
    b, t, m_dim = memory.shape
    a_dim = keys.shape[-1]
    b_pad = _round_up(max(b, SUB), SUB)
    t_pad = _round_up(max(t, LANE), LANE)

    if (b_pad, t_pad) != (b, t):
        memory = jnp.pad(memory, ((0, b_pad - b), (0, t_pad - t), (0, 0)))
        keys = jnp.pad(keys, ((0, b_pad - b), (0, t_pad - t), (0, 0)))
        memory_mask = jnp.pad(
            memory_mask.astype(jnp.float32),
            ((0, b_pad - b), (0, t_pad - t)),
        )
    mask_f = memory_mask.astype(jnp.float32)
    # Fully-padded batch rows would softmax over all -1e9: force position 0
    # valid (the kernel tests mask > 0.5) so they get a one-hot alignment.
    mask_f = mask_f.at[:, 0].set(jnp.maximum(mask_f[:, 0], 1.0))

    weights = packed_weights

    # LSA-as-matmul: fold the location conv+projection into a banded-Toeplitz
    # constant wloc[c*T + u, t*A + a] = loca[(u-t+pad_l)*loc_c + c, a] so the
    # per-step location term is one MXU matmul. wloc is O(loc_c * T^2 * A)
    # bytes and VMEM-resident across the grid; fall back to the per-tap roll
    # path when it would crowd out the weights (>48 MB).
    wloc = jnp.zeros((1, 1), jnp.float32)
    lsa_matmul = False
    if use_lsa:
        loca = jnp.asarray(weights["loca"], jnp.float32)      # (k*c, A)
        a_dim = loca.shape[1]
        wloc_bytes = 4 * loc_c * t_pad * t_pad * a_dim
        lsa_matmul = wloc_bytes <= 48 * 1024 * 1024
        if lsa_matmul:
            pad_l = (loc_k - 1) // 2
            u = jnp.arange(t_pad)[:, None]
            t_idx = jnp.arange(t_pad)[None, :]
            j_idx = u - t_idx + pad_l                         # (T, T)
            band = (j_idx >= 0) & (j_idx < loc_k)
            jc = jnp.clip(j_idx, 0, loc_k - 1)
            per_c = []
            for c in range(loc_c):
                rows = loca[jc * loc_c + c]                   # (T, T, A)
                per_c.append(rows * band[:, :, None])
            wloc = jnp.concatenate(per_c, axis=0).reshape(
                loc_c * t_pad, t_pad * a_dim)

    out_dim = 2 * LANE
    kernel = functools.partial(
        _decode_kernel,
        num_mels=num_mels, r=r, prenet_dims=tuple(dec_cfg.prenet_dims),
        dropout_rate=dec_cfg.prenet_dropout, use_dropout=use_dropout,
        use_lsa=use_lsa, loc_k=loc_k, loc_c=loc_c, lsa_matmul=lsa_matmul,
    )

    # index maps take (grid_idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ catch-all
    const = lambda *shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)

    w = weights
    in_specs = [
        const(b_pad, t_pad, m_dim),        # memory
        const(b_pad, t_pad, a_dim),        # keys
        const(b_pad, t_pad),               # mask
        const(*w["pw1"].shape), const(*w["pb1"].shape),
        const(*w["pw2"].shape), const(*w["pb2"].shape),
        const(*w["awi"].shape), const(*w["abi"].shape),
        const(*w["awh"].shape), const(*w["abh"].shape),
        const(*w["qproj"].shape), const(*w["vvec"].shape),
        const(*w["loca"].shape), const(*wloc.shape),
        const(*w["dwi"].shape), const(*w["dbi"].shape),
        const(*w["g1wi"].shape), const(*w["g1bi"].shape),
        const(*w["g1wh"].shape), const(*w["g1bh"].shape),
        const(*w["g2wi"].shape), const(*w["g2bi"].shape),
        const(*w["g2wh"].shape), const(*w["g2bh"].shape),
        const(*w["fw"].shape), const(*w["fb"].shape),
    ]
    operands = [
        memory, keys, mask_f,
        w["pw1"], w["pb1"], w["pw2"], w["pb2"],
        w["awi"], w["abi"], w["awh"], w["abh"],
        w["qproj"], w["vvec"], w["loca"], wloc, w["dwi"], w["dbi"],
        w["g1wi"], w["g1bi"], w["g1wh"], w["g1bh"],
        w["g2wi"], w["g2bi"], w["g2wh"], w["g2bh"],
        w["fw"], w["fb"],
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, b_pad, out_dim), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, t_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, dec_cfg.attention_rnn_dim), jnp.float32),
            pltpu.VMEM((b_pad, dec_cfg.decoder_rnn_dim), jnp.float32),
            pltpu.VMEM((b_pad, dec_cfg.decoder_rnn_dim), jnp.float32),
            pltpu.VMEM((b_pad, m_dim), jnp.float32),
            pltpu.VMEM((b_pad, LANE), jnp.float32),
            pltpu.VMEM((b_pad, t_pad), jnp.float32),   # prev alignment
            pltpu.VMEM((b_pad, t_pad), jnp.float32),   # cumulative alignment
        ],
    )

    out, align = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((steps, b_pad, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((steps, b_pad, t_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The LSA tap accumulation is reassociated by Mosaic into a tree
            # with many live (B, T, A) temporaries; the default 16 MB scoped
            # stack OOMs at config-3 shapes (observed 29.3 MB). Weights +
            # operands only use ~12 MB of the 128 MB VMEM, so give the
            # allocator headroom instead of serializing the accumulation.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), *operands)

    frames = out[:, :b, : r * num_mels]                      # (S, B, r*M)
    stops = out[:, :b, r * num_mels : r * num_mels + r]      # (S, B, r)
    mel = jnp.moveaxis(frames, 0, 1).reshape(b, steps * r, num_mels)
    stop_logits = jnp.moveaxis(stops, 0, 1).reshape(b, steps * r)
    alignments = jnp.moveaxis(align[:, :b, :t], 0, 1)        # (B, S, T)
    return mel, stop_logits, alignments
