"""Pallas TPU kernel: WaveRNN autoregressive sampling.

The named config-5 target (SURVEY.md §2.2 "WaveRNN-style vocoder sampling ->
AR sampling Pallas kernel, sharded over N>=2 hosts"; BASELINE.json:11).

One grid step per audio SAMPLE (a 22 kHz second = 22050 sequential steps), so
keeping the GRU/FC weights VMEM-resident across the grid is the difference
between compute-bound and weight-reload-bound sampling. Recurrent state is
the GRU hidden plus the PREVIOUS SAMPLE'S EMBEDDING (carrying the embedding
instead of the class id turns the embedding lookup into a one-hot matmul —
gather-free, MXU-native).

Sampling: Gumbel-max over the mu-law logits from the on-core PRNG
(`greedy=True` replaces it with argmax — deterministic, used for the CPU
interpreter-mode parity tests since the PRNG has no CPU lowering).

Distribution: batch shards over the `data` mesh axis exactly like the jnp
sampler (tests/test_wavernn_sharded.py); each chip runs this kernel on its
shard.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import VocoderConfig

SUB = 8


def _sample_kernel(seed_ref, cond_ref, embed_ref, wi_ref, bi_ref, wh_ref,
                   bh_ref, fc1_ref, fb1_ref, fc2_ref, fb2_ref,
                   cls_out_ref, h_scr, emb_scr,
                   *, num_classes: int, temperature: float, greedy: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        # previous sample starts at the mu-law midpoint class
        mid = num_classes // 2
        emb_scr[...] = jnp.broadcast_to(
            embed_ref[mid, :][None, :], emb_scr.shape
        )

    if not greedy:
        pltpu.prng_seed(seed_ref[0] + t)

    x = emb_scr[...] + cond_ref[0]                       # (B, C)
    h = h_scr[...]
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
    h_scr[...] = h_new

    f1 = jnp.maximum(
        jnp.dot(h_new, fc1_ref[...], preferred_element_type=jnp.float32)
        + fb1_ref[...], 0.0)
    logits = jnp.dot(f1, fc2_ref[...], preferred_element_type=jnp.float32) \
        + fb2_ref[...]                                    # (B, K)

    if greedy:
        scores = logits
    else:
        # prng_random_bits is SIGNED int32: arithmetic >> would sign-extend
        # (u < 0 -> log(-log(u)) = NaN on ~half the lanes); mask to a uniform
        # 24-bit mantissa instead (caught by the on-chip distribution test).
        bits = pltpu.prng_random_bits(logits.shape)
        u = jnp.bitwise_and(bits >> 8, (1 << 24) - 1).astype(jnp.float32) \
            * (1.0 / (1 << 24)) + 1e-9
        gumbel = -jnp.log(-jnp.log(u))
        scores = logits / temperature + gumbel

    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)   # (B,)
    cls_out_ref[0] = cls[:, None]

    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == cls[:, None]
    ).astype(jnp.float32)
    emb_scr[...] = jnp.dot(onehot, embed_ref[...],
                           preferred_element_type=jnp.float32)


def pack_wavernn_weights(params: Dict, cfg: VocoderConfig) -> Dict[str, np.ndarray]:
    """Flatten the WaveRNN param tree into kernel operand layout (host-side).

    NOTE: the kernel consumes PRE-PROJECTED conditioning (cond_proj applied
    outside), so cond_proj params stay in the XLA prologue.
    """
    p = params
    return dict(
        embed=np.asarray(p["sample_embed"]["embedding"], np.float32),
        wi=np.asarray(p["gru"]["kernel"], np.float32),
        bi=np.asarray(p["gru"]["bias"], np.float32),
        wh=np.asarray(p["gru"]["recurrent_kernel"], np.float32),
        bh=np.asarray(p["gru"]["recurrent_bias"], np.float32),
        fc1=np.asarray(p["fc1"]["kernel"], np.float32),
        fb1=np.asarray(p["fc1"]["bias"], np.float32),
        fc2=np.asarray(p["fc2"]["kernel"], np.float32),
        fb2=np.asarray(p["fc2"]["bias"], np.float32),
    )


def wavernn_sample_pallas(
    packed: Dict[str, jnp.ndarray],
    cond: jnp.ndarray,               # (B, S, C) pre-projected conditioning
    *,
    cfg: VocoderConfig,
    seed: int = 0,
    temperature: float = 1.0,
    greedy: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns mu-law classes (B, S) int32."""
    b, s, c = cond.shape
    num_classes = 2 ** cfg.wavernn_bits
    hdim = cfg.wavernn_gru_dim

    b_pad = max(SUB, ((b + SUB - 1) // SUB) * SUB)
    if b_pad != b:
        cond = jnp.pad(cond, ((0, b_pad - b), (0, 0), (0, 0)))
    cond_t = jnp.moveaxis(cond, 1, 0)  # (S, B, C)

    w = packed
    kernel = functools.partial(
        _sample_kernel, num_classes=num_classes,
        temperature=temperature, greedy=greedy,
    )
    const = lambda *shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, b_pad, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(num_classes, c),
            const(*w["wi"].shape), const(*w["bi"].shape),
            const(*w["wh"].shape), const(*w["bh"].shape),
            const(*w["fc1"].shape), const(*w["fb1"].shape),
            const(*w["fc2"].shape), const(*w["fb2"].shape),
        ],
        out_specs=pl.BlockSpec((1, b_pad, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b_pad, hdim), jnp.float32),
            pltpu.VMEM((b_pad, c), jnp.float32),
        ],
    )
    classes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, b_pad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), cond_t, w["embed"], w["wi"], w["bi"],
      w["wh"], w["bh"], w["fc1"], w["fb1"], w["fc2"], w["fb2"])
    return jnp.moveaxis(classes[:, :b, 0], 0, 1)  # (B, S)
