"""Autoregressive mel decoder as a fused scan (SURVEY.md §2.1 "Autoregressive
decoder", §7 hard part 1).

The reference decodes with a per-step Python/graph loop that re-crosses the
host<->device boundary every step (SURVEY.md §3.3). Here BOTH the
teacher-forced training unroll and autoregressive inference are a single
`nn.scan` compiled once: attention context, RNN states, alignment history
summaries, stop flags, and the last predicted frame all live in the scan
carry, on device, for the whole utterance.

Step structure (reference decoder cell):
    prenet(last frame) -> [;prev context] -> attention GRU -> query
    -> attend(query, memory) -> context
    -> Dense([query; context]) -> N residual GRUs -> decoder output
    -> Dense -> r * num_mels frames ; Dense -> r stop logits

Inference runs a fixed `max_decode_steps`-length scan carrying per-utterance
`finished` flags; true output lengths are recovered from the stop logits
afterwards (dynamic stopping inside jit without dynamic shapes). A
`lax.while_loop` variant would save the tail steps but serializes worse and
recompiles per length; the fixed scan keeps one compiled program per bucket.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AttentionConfig, DecoderConfig
from .attention import init_attention_state, make_attention
from .modules import Prenet, length_mask
from .rnn import GRUCell

Carry = Dict[str, Any]


class DecoderCell(nn.Module):
    """One decoder step; shared by teacher-forced and AR scans."""

    cfg: DecoderConfig
    attn_cfg: AttentionConfig
    num_mels: int
    memory_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.prenet = Prenet(c.prenet_dims, c.prenet_dropout, dtype=self.dtype)
        self.attention_rnn = GRUCell(c.attention_rnn_dim, dtype=self.dtype)
        self.attention = make_attention(self.attn_cfg, dtype=self.dtype)
        self.decoder_input_proj = nn.Dense(c.decoder_rnn_dim, dtype=self.dtype)
        self.decoder_rnns = [
            GRUCell(c.decoder_rnn_dim, dtype=self.dtype, name=f"decoder_rnn_{i}")
            for i in range(c.num_decoder_rnn_layers)
        ]
        self.frame_proj = nn.Dense(c.reduction_factor * self.num_mels, dtype=self.dtype)
        self.stop_proj = nn.Dense(c.reduction_factor, dtype=self.dtype)

    def precompute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.attention.precompute(memory)

    def init_carry(self, batch: int, memory_time: int, go_frame: jnp.ndarray) -> Carry:
        c = self.cfg
        return {
            "attn_rnn_h": jnp.zeros((batch, c.attention_rnn_dim), self.dtype),
            "dec_h": tuple(
                jnp.zeros((batch, c.decoder_rnn_dim), self.dtype)
                for _ in range(c.num_decoder_rnn_layers)
            ),
            "context": jnp.zeros((batch, self.memory_dim), self.dtype),
            "attn_state": init_attention_state(batch, memory_time, self.dtype),
            "last_frame": go_frame,
            "finished": jnp.zeros((batch,), jnp.bool_),
        }

    def __call__(
        self,
        carry: Carry,
        frame_input: Optional[jnp.ndarray],  # (B, num_mels) teacher frame or None (AR)
        memory: jnp.ndarray,                 # (B, T, M)
        keys: jnp.ndarray,                   # (B, T, attn_dim)
        memory_mask: Optional[jnp.ndarray],  # (B, T)
        *,
        deterministic_prenet: bool = False,
    ) -> Tuple[Carry, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        c = self.cfg
        x = frame_input if frame_input is not None else carry["last_frame"]
        x = self.prenet(x, deterministic=deterministic_prenet)

        attn_in = jnp.concatenate([x, carry["context"]], axis=-1)
        attn_h, query = self.attention_rnn(carry["attn_rnn_h"], attn_in)

        context, alignment, attn_state = self.attention(
            query, memory, keys, memory_mask, carry["attn_state"]
        )

        h = self.decoder_input_proj(jnp.concatenate([query, context], axis=-1))
        new_dec_h = []
        for cell, h_prev in zip(self.decoder_rnns, carry["dec_h"]):
            h_new, out = cell(h_prev, h)
            h = h + out  # residual connection
            new_dec_h.append(h_new)

        proj_in = jnp.concatenate([h, context], axis=-1)
        frames = self.frame_proj(proj_in)           # (B, r * num_mels)
        stop_logits = self.stop_proj(proj_in)       # (B, r)

        last_frame = frames[:, (c.reduction_factor - 1) * self.num_mels :]
        step_stopped = jnp.any(
            jax.nn.sigmoid(stop_logits) > c.stop_threshold, axis=-1
        )
        # Cast every carried array to the compute dtype: mixed-precision
        # promotions upstream (e.g. float32 memory) must not change the scan
        # carry signature between steps.
        dt = self.dtype
        new_carry = {
            "attn_rnn_h": attn_h.astype(dt),
            "dec_h": tuple(h.astype(dt) for h in new_dec_h),
            "context": context.astype(dt),
            "attn_state": {k: v.astype(dt) for k, v in attn_state.items()},
            "last_frame": last_frame.astype(dt),
            "finished": jnp.logical_or(carry["finished"], step_stopped),
        }
        return new_carry, (frames, stop_logits, alignment)


class Decoder(nn.Module):
    """Scan driver around DecoderCell."""

    cfg: DecoderConfig
    attn_cfg: AttentionConfig
    num_mels: int
    memory_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cell = DecoderCell(
            self.cfg, self.attn_cfg, self.num_mels, self.memory_dim, dtype=self.dtype
        )

    def _scan(self, carry, step_inputs, memory, keys, memory_mask, length,
              deterministic_prenet):
        """Run the step scan; step_inputs is (S, B, M) or None for AR."""

        cell = self.cell

        def body(mdl, carry, xs):
            return mdl(
                carry, xs, memory, keys, memory_mask,
                deterministic_prenet=deterministic_prenet,
            )

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=length,
        )
        return scan(cell, carry, step_inputs)

    def teacher_forced(
        self,
        memory: jnp.ndarray,
        memory_lengths: Optional[jnp.ndarray],
        mel_targets: jnp.ndarray,  # (B, T_mel, num_mels), T_mel % r == 0
        *,
        deterministic_prenet: bool = False,
    ):
        c = self.cfg
        b, t_mel, _ = mel_targets.shape
        r = c.reduction_factor
        assert t_mel % r == 0, f"mel length {t_mel} not divisible by r={r}"
        steps = t_mel // r

        # Step input i is the last frame of target group i-1 (go frame for i=0).
        # Cast to the compute dtype so the scan carry (last_frame) is
        # dtype-stable under bfloat16 compute.
        last_of_group = mel_targets[:, r - 1 :: r, :].astype(self.dtype)
        go = jnp.zeros((b, 1, self.num_mels), self.dtype)
        step_inputs = jnp.concatenate([go, last_of_group[:, :-1]], axis=1)
        step_inputs = jnp.moveaxis(step_inputs, 1, 0)           # (S, B, M)

        memory_mask = (
            length_mask(memory_lengths, memory.shape[1])
            if memory_lengths is not None else None
        )
        keys = self.cell.precompute_keys(memory)
        carry = self.cell.init_carry(b, memory.shape[1], go[:, 0, :])

        _, (frames, stop_logits, alignments) = self._scan(
            carry, step_inputs, memory, keys, memory_mask, steps,
            deterministic_prenet,
        )
        # (S, B, r*M) -> (B, S*r, M)
        mel_out = jnp.moveaxis(frames, 0, 1).reshape(b, steps * r, self.num_mels)
        stops = jnp.moveaxis(stop_logits, 0, 1).reshape(b, steps * r)
        alignments = jnp.moveaxis(alignments, 0, 1)  # (B, S, T)
        return mel_out, stops, alignments

    def decode(
        self,
        memory: jnp.ndarray,
        memory_lengths: Optional[jnp.ndarray],
        *,
        max_steps: Optional[int] = None,
        deterministic_prenet: bool = False,
    ):
        """Autoregressive inference: fixed-length scan + stop-flag masking.

        Returns (mel (B, S*r, M), stop_logits (B, S*r), alignments (B, S, T),
        frame_lengths (B,)).
        """
        c = self.cfg
        b = memory.shape[0]
        steps = max_steps if max_steps is not None else c.max_decode_steps

        memory_mask = (
            length_mask(memory_lengths, memory.shape[1])
            if memory_lengths is not None else None
        )
        keys = self.cell.precompute_keys(memory)
        go = jnp.zeros((b, self.num_mels), self.dtype)
        carry = self.cell.init_carry(b, memory.shape[1], go)

        _, (frames, stop_logits, alignments) = self._scan(
            carry, None, memory, keys, memory_mask, steps, deterministic_prenet
        )

        mel_out = jnp.moveaxis(frames, 0, 1).reshape(b, steps * c.reduction_factor,
                                                     self.num_mels)
        stops = jnp.moveaxis(stop_logits, 0, 1).reshape(
            b, steps * c.reduction_factor
        )
        alignments = jnp.moveaxis(alignments, 0, 1)

        if c.use_stop_token:
            stopped = jax.nn.sigmoid(stops) > c.stop_threshold  # (B, F)
            any_stop = jnp.any(stopped, axis=1)
            first_stop = jnp.argmax(stopped, axis=1) + 1
            frame_lengths = jnp.where(any_stop, first_stop, mel_out.shape[1])
        else:
            frame_lengths = jnp.full((b,), mel_out.shape[1], jnp.int32)

        # Zero frames past each utterance's stop for clean vocoding.
        fmask = length_mask(frame_lengths, mel_out.shape[1])
        mel_out = mel_out * fmask[..., None].astype(mel_out.dtype)
        return mel_out, stops, alignments, frame_lengths
