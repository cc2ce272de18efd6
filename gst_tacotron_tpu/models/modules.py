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
import numpy as np


# Keras BatchNormalization default epsilon — the reference lineage is TF2
# Keras layers, and TF-checkpoint parity (SURVEY.md §7 hard part 2) requires
# matching it (flax's default is 1e-5, a silent allclose-breaker).
BN_EPS = 1e-3


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


class MatmulConv1D(nn.Module):
    """SAME-padded 1-D convolution as a single shifted-stack matmul.

    Drop-in for `nn.Conv(features, (k,))` with identical parameter layout
    (kernel (k, in, out), optional bias) — but executed as ONE MXU matmul of
    the k-shifted input against the flattened kernel. On this TPU runtime a
    small nn.Conv costs ~10-25 ms of dispatch/lowering overhead per op
    (measured: the K=16 conv bank alone was 417 ms); the matmul form is
    ~100x cheaper at these shapes and fully differentiable.
    """

    features: int
    kernel_size: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        b, t, c_in = x.shape
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (k, c_in, self.features))
        pad_l, pad_r = (k - 1) // 2, k // 2
        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
        x_cat = jnp.concatenate(
            [xp[:, j : j + t] for j in range(k)], axis=-1
        ).astype(self.dtype)
        w = kernel.reshape(k * c_in, self.features).astype(self.dtype)
        y = x_cat @ w
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class MatmulConv2DStride2(nn.Module):
    """3x3 stride-2x2 SAME conv2d as patch-extract + one matmul.

    Drop-in for `nn.Conv(features, (3, 3), strides=(2, 2), padding="SAME")`
    with identical kernel layout (3, 3, in, out). The 9 taps become 9 strided
    static slices concatenated on the channel axis, contracted in a single
    (B*H'*W', 9*C) @ (9*C, F) MXU matmul — the TPU-native form of the GST
    reference-encoder conv stack (the C_in=1 first layer is hopeless for the
    conv units but dense for the MXU).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (3, 3, c, self.features))
        h_out, w_out = (h + 1) // 2, (w + 1) // 2
        # TF SAME for stride 2, k=3
        pad_h = max(0, (h_out - 1) * 2 + 3 - h)
        pad_w = max(0, (w_out - 1) * 2 + 3 - w)
        xp = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                         (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        patches = []
        for di in range(3):
            for dj in range(3):
                patches.append(
                    xp[:, di : di + 2 * h_out : 2, dj : dj + 2 * w_out : 2, :]
                )
        x_cat = jnp.concatenate(patches, axis=-1).astype(self.dtype)
        wmat = kernel.reshape(9 * c, self.features).astype(self.dtype)
        return x_cat @ wmat


class ConvBankBlock(nn.Module):
    """Conv1d bank: K parallel convs, widths 1..K, each BN+ReLU, concat.
    Output: (B, T, K * channels).

    TPU-native formulation: instead of K separate small convolutions, the
    whole bank is ONE matmul. All bank outputs are linear in the 2K-ish
    shifted copies of x, so we build X_cat = [x shifted by s for each tap
    offset s] (static slices, the same hop-chunk trick as the DSP framing)
    and a block matrix W_big whose (s, k) block is conv_k's tap at offset s
    (zero outside its width). y = X_cat @ W_big is a single (T*B, S*C) x
    (S*C, K*C) MXU matmul — identical math to the K SAME-padded convs, and
    differentiable, so it serves training too.
    """

    bank_k: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tap_mask(bank_k: int, c_in: int, channels: int) -> np.ndarray:
        """0/1 mask over the (S*C_in, K*C_out) block matrix marking valid
        taps: block (shift s, bank k) is live iff 0 <= s+(k-1)//2 < k."""
        smin = -((bank_k - 1) // 2)
        smax = bank_k // 2
        nshift = smax - smin + 1
        mask = np.zeros((nshift, c_in, bank_k, channels), np.float32)
        for si, s in enumerate(range(smin, smax + 1)):
            for k in range(1, bank_k + 1):
                if 0 <= s + (k - 1) // 2 < k:
                    mask[si, :, k - 1, :] = 1.0
        return mask.reshape(nshift * c_in, bank_k * channels)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray], train: bool):
        x = mask_sequence(x, lengths)
        b, t, c_in = x.shape
        kmax = self.bank_k
        smin = -((kmax - 1) // 2)
        smax = kmax // 2
        shifts = list(range(smin, smax + 1))
        nshift = len(shifts)

        # The whole bank is ONE parameter: the block tap matrix itself.
        # Invalid taps are zero-masked (numpy-constant multiply, one op) —
        # they get zero gradient and stay zero, so semantics equal K separate
        # SAME convs of widths 1..K.
        mask = self.tap_mask(kmax, c_in, self.channels)  # np constant
        w_big = self.param(
            "bank_kernel",
            lambda key, shape: nn.initializers.glorot_uniform()(key, shape)
            * mask,
            (nshift * c_in, kmax * self.channels),
        )
        w_big = (w_big * mask).astype(self.dtype)

        # X_cat: (B, T, S*C) from static shifted slices
        xp = jnp.pad(x, ((0, 0), (-smin, smax), (0, 0)))
        x_cat = jnp.concatenate(
            [xp[:, s - smin : s - smin + t] for s in shifts], axis=-1
        ).astype(self.dtype)

        y = x_cat @ w_big  # (B, T, K*C_out)
        y = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS, dtype=self.dtype,
                         name="bn")(y)
        return nn.relu(y)


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
            y = MatmulConv1D(ch, 3, dtype=self.dtype, name=f"proj_{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS, dtype=self.dtype,
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
            x = MatmulConv1D(ch, self.kernel_size, dtype=self.dtype,
                             name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            if i + 1 < n or self.final_activation:
                x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, name=f"dropout_{i}")(
                x, deterministic=not train
            )
        return x
