"""Pallas TPU kernel: full GRU sequence scan with VMEM-resident weights.

Companion to ops/decode_pallas.py for the NON-autoregressive recurrences
(encoder CBHG BiGRU, post-net BiGRU, GST reference-encoder GRU). On this
runtime each `lax.scan` step pays ~1 ms of kernel-launch overhead, so a
400-frame post-net BiGRU costs ~0.8 s; this kernel runs the whole scan as a
1-D "arbitrary" grid — one grid step per frame, weights loaded once, state in
persistent VMEM scratch — for microseconds per step.

Semantics match models/rnn.py::GRU exactly (Keras-v2 reset_after cell,
masked steps hold the carry). Inference-only (no VJP); training uses the
lax.scan path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8


def _gru_seq_kernel(x_ref, m_ref, h0_ref, wi_ref, bi_ref, wh_ref, bh_ref,
                    y_ref, h_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[...] = h0_ref[...]

    x = x_ref[0]                      # (B, D)
    h = h_scr[...]                    # (B, H)
    gx = jnp.dot(x, wi_ref[...], preferred_element_type=jnp.float32) \
        + bi_ref[...]
    gh = jnp.dot(h, wh_ref[...], preferred_element_type=jnp.float32) \
        + bh_ref[...]
    hdim = h.shape[-1]
    xz, xr, xn = gx[:, :hdim], gx[:, hdim:2 * hdim], gx[:, 2 * hdim:]
    hz, hr, hn = gh[:, :hdim], gh[:, hdim:2 * hdim], gh[:, 2 * hdim:]
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    h_new = z * h + (1.0 - z) * n

    keep = m_ref[0]                   # (B, 1)
    h_new = keep * h_new + (1.0 - keep) * h
    h_scr[...] = h_new
    y_ref[0] = h_new


def gru_scan_pallas(
    xs: jnp.ndarray,                 # (B, T, D) float32
    h0: jnp.ndarray,                 # (B, H)
    wi: jnp.ndarray, bi: jnp.ndarray,
    wh: jnp.ndarray, bh: jnp.ndarray,
    *,
    lengths: Optional[jnp.ndarray] = None,
    reverse: bool = False,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ys (B, T, H), final (B, H)); same contract as models.rnn.GRU."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    b, t, d = xs.shape
    hdim = h0.shape[-1]

    mask = (
        (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
        if lengths is not None else jnp.ones((b, t), jnp.float32)
    )
    if reverse:
        xs = jnp.flip(xs, axis=1)
        mask = jnp.flip(mask, axis=1)

    b_pad = max(SUB, ((b + SUB - 1) // SUB) * SUB)
    if b_pad != b:
        xs = jnp.pad(xs, ((0, b_pad - b), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, b_pad - b), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))

    xs_t = jnp.moveaxis(xs, 1, 0)              # (T, B, D)
    mask_t = jnp.moveaxis(mask, 1, 0)[..., None]  # (T, B, 1): 3-D so the
    # (1, B, 1) block satisfies Mosaic's (sublane, lane) divisibility rules

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    ys = pl.pallas_call(
        _gru_seq_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(b_pad, hdim),
            const(d, 3 * hdim), const(3 * hdim,),
            const(hdim, 3 * hdim), const(3 * hdim,),
        ],
        out_specs=pl.BlockSpec((1, b_pad, hdim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, hdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, hdim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xs_t, mask_t, h0, wi, bi, wh, bh)

    final = ys[-1, :b]                    # masked steps held the state
    ys = jnp.moveaxis(ys[:, :b], 0, 1)    # (B, T, H)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, final
