"""Decoder attention mechanisms (SURVEY.md §2.1 "Attention", "Location-sensitive").

Both mechanisms are written as *per-step* modules designed to live inside the
decoder's `nn.scan` (SURVEY.md §7 hard parts 1 & 3):

  * `precompute(memory)` projects the encoder states to attention keys once,
    outside the scan — the per-step cost is then one (B, D) query projection,
    one (B, T) score reduction, and one (B, T) x (B, T, D) context matvec,
    all MXU-friendly batched ops.
  * The carried state is a flat dict of (B, T) arrays (previous alignment and
    cumulative alignment), so it drops straight into the scan carry and can be
    exchanged via collectives in distributed decode (SURVEY.md §2.3).
  * The location conv runs on the 2-channel (prev, cumulative) alignment
    image per step — a (B, T, 2) -> (B, T, filters) SAME conv, never
    materializing alignment history (hard part 3).

Scores at padded memory positions are masked to -inf before the softmax.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import AttentionConfig

AttnState = Dict[str, jnp.ndarray]


def init_attention_state(batch: int, memory_time: int, dtype=jnp.float32) -> AttnState:
    """Initial carry: alignment starts as a delta on frame 0 (standard init)."""
    alignment = jnp.zeros((batch, memory_time), dtype).at[:, 0].set(1.0)
    return {
        "alignment": alignment,
        "cumulative": jnp.zeros((batch, memory_time), dtype),
    }


class BahdanauAttention(nn.Module):
    """Additive content-based attention (reference BahdanauAttention cell)."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_proj = nn.Dense(self.cfg.dim, use_bias=False, dtype=self.dtype)
        self.memory_proj = nn.Dense(self.cfg.dim, use_bias=False, dtype=self.dtype)
        self.score_v = nn.Dense(1, use_bias=False, dtype=self.dtype)

    def precompute(self, memory: jnp.ndarray) -> jnp.ndarray:
        """(B, T, M) encoder states -> (B, T, dim) keys; call outside the scan."""
        return self.memory_proj(memory)

    def __call__(
        self,
        query: jnp.ndarray,            # (B, Q) attention-RNN output
        memory: jnp.ndarray,           # (B, T, M) encoder states (values)
        keys: jnp.ndarray,             # (B, T, dim) precomputed keys
        memory_mask: Optional[jnp.ndarray],  # (B, T) bool
        state: AttnState,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, AttnState]:
        q = self.query_proj(query)[:, None, :]  # (B, 1, dim)
        scores = self.score_v(jnp.tanh(keys + q))[..., 0]  # (B, T)
        if memory_mask is not None:
            scores = jnp.where(memory_mask, scores, -1e9)
        alignment = nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btm->bm", alignment, memory)
        new_state = {
            "alignment": alignment,
            "cumulative": state["cumulative"] + alignment,
        }
        return context, alignment, new_state


class LocationSensitiveAttention(nn.Module):
    """Content + location attention (Chorowski 2015; reference LSA).

    score = v^T tanh(W_k memory + W_q query + W_f conv([prev; cum]))
    """

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.query_proj = nn.Dense(c.dim, use_bias=False, dtype=self.dtype)
        self.memory_proj = nn.Dense(c.dim, use_bias=False, dtype=self.dtype)
        from .modules import MatmulConv1D

        self.location_conv = MatmulConv1D(
            c.location_filters, c.location_kernel_size, dtype=self.dtype,
        )
        self.location_proj = nn.Dense(c.dim, use_bias=False, dtype=self.dtype)
        self.score_v = nn.Dense(1, use_bias=False, dtype=self.dtype)

    def precompute(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_proj(memory)

    def __call__(
        self,
        query: jnp.ndarray,
        memory: jnp.ndarray,
        keys: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
        state: AttnState,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, AttnState]:
        q = self.query_proj(query)[:, None, :]
        feats = jnp.stack(
            [state["alignment"], state["cumulative"]], axis=-1
        )  # (B, T, 2)
        if not self.cfg.cumulative:
            feats = feats[..., :1]
        loc = self.location_proj(self.location_conv(feats))  # (B, T, dim)
        scores = self.score_v(jnp.tanh(keys + q + loc))[..., 0]
        if memory_mask is not None:
            scores = jnp.where(memory_mask, scores, -1e9)
        alignment = nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,btm->bm", alignment, memory)
        new_state = {
            "alignment": alignment,
            "cumulative": state["cumulative"] + alignment,
        }
        return context, alignment, new_state


def make_attention(cfg: AttentionConfig, dtype=jnp.float32, name: str = "attention"):
    if cfg.kind == "bahdanau":
        return BahdanauAttention(cfg, dtype=dtype, name=name)
    if cfg.kind == "location_sensitive":
        return LocationSensitiveAttention(cfg, dtype=dtype, name=name)
    raise ValueError(f"unknown attention kind {cfg.kind!r}")


def alignment_diagonality(alignments: jnp.ndarray,
                          text_lengths: jnp.ndarray,
                          frame_lengths: jnp.ndarray) -> jnp.ndarray:
    """Diagonality score in [0, 1] for (B, S, T) alignment stacks.

    Measures how much attention mass lies inside a band around the ideal
    monotone diagonal — the config-3 alignment-stress regression metric
    (SURVEY.md §4, BASELINE.json:9).
    """
    b, s, t = alignments.shape
    steps = jnp.arange(s)[None, :, None].astype(jnp.float32)     # decode step
    tokens = jnp.arange(t)[None, None, :].astype(jnp.float32)    # memory pos
    # ideal token index for each step, per utterance
    rate = text_lengths[:, None, None] / jnp.maximum(
        frame_lengths[:, None, None].astype(jnp.float32), 1.0
    )
    ideal = steps * rate
    band = jnp.maximum(0.1 * text_lengths[:, None, None].astype(jnp.float32), 3.0)
    inside = (jnp.abs(tokens - ideal) <= band).astype(jnp.float32)
    step_mask = (
        jnp.arange(s)[None, :] < frame_lengths[:, None]
    ).astype(jnp.float32)  # (B, S)
    mass_in = jnp.einsum("bst,bst,bs->b", alignments, inside, step_mask)
    total = jnp.maximum(jnp.sum(step_mask, axis=1), 1.0)
    return mass_in / total
