"""Global Style Tokens: reference encoder + style-token attention layer.

Reference parity (SURVEY.md §2.1 "GST reference encoder", "Style token layer"):
  * ReferenceEncoder: ref mel (B, T, n_mels) -> 6 x [conv2d 3x3, stride 2x2,
    BN, ReLU] with channels (32,32,64,64,128,128) -> flatten freq -> GRU(128)
    -> final state (B, 128).
  * StyleTokenLayer: learned bank of 10 tokens, tanh-activated, attended by a
    4-head attention with the reference embedding as query; output is the
    (B, style_dim) style embedding, broadcast-concatenated to every encoder
    frame by the caller.

TPU notes: the conv stack is a named per-chip speed-of-light target
(BASELINE.json:5); it is expressed as plain XLA convs here (batched, channels
last) so Mosaic/XLA tile it onto the MXU, and is benchmarked in bench.py. The
token-attention matmuls are sharded on the `model` mesh axis via the logical
axis annotations on the projection params (parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import GSTConfig
from .rnn import GRU


class ReferenceEncoder(nn.Module):
    cfg: GSTConfig
    num_mels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_mel: jnp.ndarray, mel_lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = ref_mel[..., None]  # (B, T, F, 1): NHWC with time as H
        if mel_lengths is not None:
            tmask = (jnp.arange(x.shape[1])[None, :] < mel_lengths[:, None]).astype(
                x.dtype
            )
            x = x * tmask[:, :, None, None]
        from .modules import BN_EPS, MatmulConv2DStride2

        for i, ch in enumerate(c.ref_conv_channels):
            x = MatmulConv2DStride2(ch, dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        # (B, T', F', C) -> (B, T', F'*C)
        b, t, f, ch = x.shape
        x = x.reshape(b, t, f * ch)
        stride_total = 2 ** len(c.ref_conv_channels)
        gru_lengths = None
        if mel_lengths is not None:
            gru_lengths = jnp.maximum(
                1, (mel_lengths + stride_total - 1) // stride_total
            )
        _, final = GRU(c.ref_gru_dim, dtype=self.dtype, name="gru")(x, gru_lengths, train=train)
        return final  # (B, ref_gru_dim)


class StyleTokenLayer(nn.Module):
    """Multi-head attention of the reference embedding over learned tokens."""

    cfg: GSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_embedding: jnp.ndarray,
                 token_weights: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ref_embedding (B, D) -> (style (B, style_dim), attn (B, heads, tokens)).

        If `token_weights` (B, num_tokens) is given, the attention distribution
        is replaced by it — the "synthesize from explicit token weights" control
        path of GST inference.
        """
        c = self.cfg
        head_dim = c.style_dim // c.num_heads
        assert c.style_dim % c.num_heads == 0

        tokens = self.param(
            "tokens",
            nn.initializers.normal(0.5),
            (c.num_tokens, c.style_dim // c.num_heads),
        )
        keys_base = jnp.tanh(tokens).astype(self.dtype)  # (N, head_dim)

        q = nn.Dense(c.style_dim, use_bias=False, dtype=self.dtype, name="query_proj")(
            ref_embedding
        )  # (B, style_dim)
        k = nn.Dense(c.style_dim, use_bias=False, dtype=self.dtype, name="key_proj")(
            keys_base
        )  # (N, style_dim)
        v = nn.Dense(c.style_dim, use_bias=False, dtype=self.dtype, name="value_proj")(
            keys_base
        )  # (N, style_dim)

        b = q.shape[0]
        q = q.reshape(b, c.num_heads, head_dim)
        k = k.reshape(c.num_tokens, c.num_heads, head_dim)
        v = v.reshape(c.num_tokens, c.num_heads, head_dim)

        scores = jnp.einsum("bhd,nhd->bhn", q, k) / np.sqrt(head_dim)
        attn = nn.softmax(scores, axis=-1)  # (B, heads, tokens)
        if token_weights is not None:
            attn = jnp.broadcast_to(
                token_weights[:, None, :].astype(attn.dtype), attn.shape
            )
        style = jnp.einsum("bhn,nhd->bhd", attn, v).reshape(b, c.style_dim)
        return style, attn


class GST(nn.Module):
    """ReferenceEncoder + StyleTokenLayer, the full GST block."""

    cfg: GSTConfig
    num_mels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_mel: Optional[jnp.ndarray],
                 mel_lengths: Optional[jnp.ndarray] = None,
                 token_weights: Optional[jnp.ndarray] = None,
                 *, train: bool = False):
        stl = StyleTokenLayer(self.cfg, dtype=self.dtype, name="stl")
        if ref_mel is None:
            # Token-weight-driven synthesis: no reference audio needed.
            assert token_weights is not None
            zero_ref = jnp.zeros(
                (token_weights.shape[0], self.cfg.ref_gru_dim), self.dtype
            )
            return stl(zero_ref, token_weights)
        ref = ReferenceEncoder(self.cfg, self.num_mels, dtype=self.dtype,
                               name="reference_encoder")(
            ref_mel, mel_lengths, train=train
        )
        return stl(ref, token_weights)
