"""Shared flax modules: prenet, highway, conv bank, CBHG.

TPU-native counterparts of the reference's Modules.py Keras layers
(SURVEY.md §2.1 "Token embedding + prenet", "CBHG"). Conventions:

  * All sequence tensors are (B, T, C); convs are `nn.Conv` with SAME padding
    over the time axis, matching Keras "same" semantics.
  * Padded positions are re-zeroed before every conv so pad frames never leak
    into valid frames (the reference relies on its feeder's exact padding).
  * Prenet dropout is ALWAYS ON by default — a deliberate Tacotron trait the
    reference keeps at inference (SURVEY.md §2.1); `deterministic=True` turns
    it off for parity/eval experiments.
  * BatchNorm uses the `batch_stats` collection; pass `train=True` during
    training and make the collection mutable in the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, time: int) -> jnp.ndarray:
    """(B,) -> (B, T) boolean validity mask."""
    return jnp.arange(time)[None, :] < lengths[:, None]


def mask_sequence(xs: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    if lengths is None:
        return xs
    return xs * length_mask(lengths, xs.shape[1])[..., None].astype(xs.dtype)


class Prenet(nn.Module):
    """FC stack with always-on dropout (reference Prenet; SURVEY.md §2.1)."""

    layer_dims: Sequence[int]
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = False) -> jnp.ndarray:
        for i, dim in enumerate(self.layer_dims):
            x = nn.Dense(dim, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, name=f"dropout_{i}")(
                x, deterministic=deterministic
            )
        return x


class Highway(nn.Module):
    """Highway layer: H(x)*T(x) + x*(1-T(x)) (reference Highway)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.features, dtype=self.dtype, name="h")(x))
        t = nn.sigmoid(
            nn.Dense(
                self.features,
                dtype=self.dtype,
                bias_init=nn.initializers.constant(-1.0),
                name="t",
            )(x)
        )
        return h * t + x * (1.0 - t)


class ConvBankBlock(nn.Module):
    """Conv1d bank: K parallel convs, widths 1..K, each BN+ReLU, concat.

    The K convolutions share input; XLA fuses them into a handful of MXU
    convolutions per width. Output: (B, T, K * channels).
    """

    bank_k: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray], train: bool):
        x = mask_sequence(x, lengths)
        outs = []
        for k in range(1, self.bank_k + 1):
            y = nn.Conv(self.channels, (k,), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv_{k}")(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn_{k}")(y)
            outs.append(nn.relu(y))
        return jnp.concatenate(outs, axis=-1)


class CBHG(nn.Module):
    """Conv Bank + Highway + GRU (reference CBHG; SURVEY.md §2.1).

    bank(K) -> maxpool(2, stride 1) -> conv projections (+BN) -> residual with
    the input -> highway stack -> BiGRU. Used as the encoder body (K=16) and
    as the post-net mel->linear (K=8).
    """

    bank_k: int
    bank_channels: int
    proj_channels: Tuple[int, ...]
    highway_layers: int
    highway_dim: int
    gru_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False):
        residual = x
        y = ConvBankBlock(self.bank_k, self.bank_channels, dtype=self.dtype,
                          name="bank")(x, lengths, train)
        # maxpool width 2, stride 1, SAME
        y = mask_sequence(y, lengths)
        padded = jnp.pad(y, ((0, 0), (0, 1), (0, 0)), constant_values=-jnp.inf)
        y = jnp.maximum(padded[:, :-1], padded[:, 1:])

        for i, ch in enumerate(self.proj_channels):
            y = mask_sequence(y, lengths)
            y = nn.Conv(ch, (3,), padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"proj_{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"proj_bn_{i}")(y)
            if i + 1 < len(self.proj_channels):
                y = nn.relu(y)

        if residual.shape[-1] != y.shape[-1]:
            residual = nn.Dense(y.shape[-1], dtype=self.dtype, name="residual_proj")(
                residual
            )
        y = y + residual

        if y.shape[-1] != self.highway_dim:
            y = nn.Dense(self.highway_dim, dtype=self.dtype, name="pre_highway")(y)
        for i in range(self.highway_layers):
            y = Highway(self.highway_dim, dtype=self.dtype, name=f"highway_{i}")(y)

        from .rnn import BiGRU

        y = mask_sequence(y, lengths)
        out, _ = BiGRU(self.gru_dim, dtype=self.dtype, name="bigru")(y, lengths, train=train)
        return out


class Conv1dBNStack(nn.Module):
    """Taco2-style conv stack: N x (conv -> BN -> activation -> dropout)."""

    channels: Sequence[int]
    kernel_size: int = 5
    dropout_rate: float = 0.5
    final_activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray], *,
                 train: bool = False):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = mask_sequence(x, lengths)
            x = nn.Conv(ch, (self.kernel_size,), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            if i + 1 < n or self.final_activation:
                x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, name=f"dropout_{i}")(
                x, deterministic=not train
            )
        return x
