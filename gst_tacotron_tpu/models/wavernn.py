"""WaveRNN-style autoregressive neural vocoder (BASELINE.json:11, config 5).

Not present in the reference (it is Griffin-Lim only — SURVEY.md §2.2 last
row); this is the framework's neural vocoder stage, pluggable behind the same
vocode interface. Architecture (WaveRNN-family, simplified single softmax):

    sample embedding (mu-law class of s_{t-1})  +  frame conditioning
      -> GRU(gru_dim) -> relu FC -> softmax over 2**bits mu-law classes

Training is teacher-forced and fully parallel over time (one GRU scan, all
projections batched — MXU-friendly). Sampling is a fixed-length `lax.scan`
carrying (GRU state, previous sample class, PRNG) on device; the per-step
matmuls are the Pallas fused-sampling kernel target (ops/wavernn_pallas.py).

Distribution: utterance batches shard over the `data` mesh axis (each chip
samples its shard); the GRU/FC kernels shard over `model` via the TP rules in
parallel/sharding.py (GSPMD inserts the psums), which is the "sharded over
N>=2 hosts" requirement of config 5.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VocoderConfig
from ..dsp.jax_dsp import mulaw_decode, mulaw_encode
from .rnn import GRUCell


class WaveRNN(nn.Module):
    cfg: VocoderConfig
    num_mels: int
    dtype: jnp.dtype = jnp.float32

    @property
    def num_classes(self) -> int:
        return 2 ** self.cfg.wavernn_bits

    def setup(self):
        c = self.cfg
        self.sample_embed = nn.Embed(self.num_classes, c.wavernn_fc_dim,
                                     dtype=self.dtype)
        self.cond_proj = nn.Dense(c.wavernn_fc_dim, dtype=self.dtype)
        self.gru = GRUCell(c.wavernn_gru_dim, dtype=self.dtype, name="gru")
        self.fc1 = nn.Dense(c.wavernn_fc_dim, dtype=self.dtype, name="fc1")
        self.fc2 = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")

    # -- conditioning -------------------------------------------------------

    def upsample_cond(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, M) mel -> (B, T*hop, fc_dim) per-sample conditioning.

        Frame-rate projection then hop-times repeat: the projection runs at
        frame rate (cheap); only the repeat touches sample rate.
        """
        cond = self.cond_proj(mel)  # (B, T, C)
        return jnp.repeat(cond, self.cfg.wavernn_hop, axis=1)

    def _step_logits(self, h, prev_class, cond_t):
        x = self.sample_embed(prev_class) + cond_t
        h_new, out = self.gru(h, x)
        logits = self.fc2(nn.relu(self.fc1(out)))
        return h_new, logits

    # -- training (teacher-forced, parallel over time) ----------------------

    def __call__(self, mel: jnp.ndarray, wav: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, M), wav (B, T*hop) in [-1,1] -> logits (B, T*hop, K).

        Predicts sample t from samples <t and conditioning; returns logits
        aligned with the mu-law classes of `wav`.
        """
        cond = self.upsample_cond(mel)
        classes = mulaw_encode(wav, self.cfg.wavernn_bits)  # (B, S)
        prev = jnp.pad(classes, ((0, 0), (1, 0)),
                       constant_values=self.num_classes // 2)[:, :-1]
        x = self.sample_embed(prev) + cond  # (B, S, C)

        b = mel.shape[0]
        h0 = jnp.zeros((b, self.cfg.wavernn_gru_dim), self.dtype)

        def body(mdl, h, x_t):
            h_new, out = mdl.gru(h, x_t)
            return h_new, out

        scan = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        _, outs = scan(self, h0, x)
        return self.fc2(nn.relu(self.fc1(outs)))

    def loss(self, mel: jnp.ndarray, wav: jnp.ndarray,
             sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        logits = self(mel, wav)
        targets = mulaw_encode(wav, self.cfg.wavernn_bits)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if sample_mask is not None:
            return jnp.sum(nll * sample_mask) / jnp.maximum(
                jnp.sum(sample_mask), 1.0
            )
        return jnp.mean(nll)

    # -- sampling (fixed-length on-device scan) -----------------------------

    def sample(self, mel: jnp.ndarray, rng: jax.Array,
               temperature: float = 1.0, greedy: bool = False) -> jnp.ndarray:
        """mel (B, T, M) -> wav (B, T*hop) in [-1, 1].

        greedy=True takes the argmax class each step (deterministic; used as
        the parity oracle for the Pallas sampling kernel)."""
        cond = self.upsample_cond(mel)  # (B, S, C)
        b, s, _ = cond.shape
        h0 = jnp.zeros((b, self.cfg.wavernn_gru_dim), self.dtype)
        c0 = jnp.full((b,), self.num_classes // 2, jnp.int32)

        def body(mdl, carry, cond_t):
            h, prev, key = carry
            key, sub = jax.random.split(key)
            h_new, logits = mdl._step_logits(h, prev, cond_t)
            if greedy:
                cls = jnp.argmax(logits, axis=-1)
            else:
                cls = jax.random.categorical(sub, logits / temperature, axis=-1)
            return (h_new, cls, key), cls

        scan = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        _, classes = scan(self, (h0, c0, rng), cond)
        return mulaw_decode(classes, self.cfg.wavernn_bits)
