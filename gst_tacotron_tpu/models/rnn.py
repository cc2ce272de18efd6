"""Recurrent cells and scan drivers.

The reference's recurrence is TF-Keras GRU (encoder CBHG BiGRU, GST reference
encoder GRU, decoder attention/decoder GRUs; SURVEY.md §2.1). For a future
TF-checkpoint import to hit allclose (SURVEY.md §7 hard part 2), the cell
reproduces Keras v2 semantics exactly:

  * gate order [z, r, n] in the fused kernels,
  * ``reset_after=True``: the reset gate multiplies the *post-matmul*
    recurrent term, with a separate recurrent bias,
  * new state h' = z * h + (1 - z) * n.

All sequence processing is `nn.scan` over time with length masking carried in
the scan (no Python loops over timesteps — SURVEY.md §3.2/3.3 rebuild notes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRUCell(nn.Module):
    """Keras-v2-compatible GRU cell with fused gate matmuls."""

    features: int
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.glorot_uniform()
    recurrent_init: nn.initializers.Initializer = nn.initializers.orthogonal()

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray):
        hdim = self.features
        wi = self.param("kernel", self.kernel_init, (x.shape[-1], 3 * hdim))
        wh = self.param("recurrent_kernel", self.recurrent_init, (hdim, 3 * hdim))
        bi = self.param("bias", nn.initializers.zeros, (3 * hdim,))

        x = x.astype(self.dtype)
        h = h.astype(self.dtype)
        gx = x @ wi.astype(self.dtype) + bi.astype(self.dtype)
        xz, xr, xn = jnp.split(gx, 3, axis=-1)

        if self.reset_after:
            bh = self.param("recurrent_bias", nn.initializers.zeros, (3 * hdim,))
            gh = h @ wh.astype(self.dtype) + bh.astype(self.dtype)
            hz, hr, hn = jnp.split(gh, 3, axis=-1)
            z = jax.nn.sigmoid(xz + hz)
            r = jax.nn.sigmoid(xr + hr)
            n = jnp.tanh(xn + r * hn)
        else:
            whz, whr, whn = jnp.split(wh.astype(self.dtype), 3, axis=-1)
            z = jax.nn.sigmoid(xz + h @ whz)
            r = jax.nn.sigmoid(xr + h @ whr)
            n = jnp.tanh(xn + (r * h) @ whn)

        h_new = z * h + (1.0 - z) * n
        return h_new, h_new

    def initial_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.features), self.dtype)


def _masked_scan_gru(cell: GRUCell, xs: jnp.ndarray, mask: Optional[jnp.ndarray],
                     h0: Optional[jnp.ndarray]):
    """Scan `cell` over time axis 1 of xs (B, T, D) with optional (B, T) mask.

    At masked (padded) steps the carry is held constant, so the final state is
    the state at each sequence's true last step.
    """
    batch = xs.shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, cell.features), cell.dtype)

    class _Step(nn.Module):
        cell: GRUCell

        @nn.compact
        def __call__(self, h, inputs):
            x, m = inputs
            h_new, y = self.cell(h, x)
            if m is not None:
                keep = m[:, None].astype(h_new.dtype)
                h_new = keep * h_new + (1.0 - keep) * h
                y = h_new
            return h_new, y

    scan = nn.scan(
        _Step,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )
    m = mask if mask is None else mask.astype(xs.dtype)
    return scan(cell)(h0, (xs, m))


class GRU(nn.Module):
    """Unidirectional GRU over (B, T, D) -> ((B, T, H), final (B, H))."""

    features: int
    reverse: bool = False
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None):
        time = xs.shape[1]
        mask = None
        if lengths is not None:
            mask = jnp.arange(time)[None, :] < lengths[:, None]
        if self.reverse:
            xs = jnp.flip(xs, axis=1)
            if mask is not None:
                mask = jnp.flip(mask, axis=1)
        cell = GRUCell(self.features, reset_after=self.reset_after, dtype=self.dtype)
        final, ys = _masked_scan_gru(cell, xs, mask, initial_state)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, final


class BiGRU(nn.Module):
    """Bidirectional GRU; output concat -> (B, T, 2H)."""

    features: int
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        fwd, fwd_final = GRU(self.features, reverse=False, reset_after=self.reset_after,
                             dtype=self.dtype, name="forward")(xs, lengths)
        bwd, bwd_final = GRU(self.features, reverse=True, reset_after=self.reset_after,
                             dtype=self.dtype, name="backward")(xs, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1), (fwd_final, bwd_final)


class ZoneoutGRUCell(nn.Module):
    """GRU cell with zoneout regularization on the state (Taco2-lineage option)."""

    features: int
    zoneout: float = 0.1
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, *, deterministic: bool = True):
        cell = GRUCell(self.features, reset_after=self.reset_after, dtype=self.dtype)
        h_new, _ = cell(h, x)
        if self.zoneout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep_old = jax.random.bernoulli(rng, self.zoneout, h_new.shape)
            h_new = jnp.where(keep_old, h, h_new)
        elif self.zoneout > 0.0:
            h_new = self.zoneout * h + (1.0 - self.zoneout) * h_new
        return h_new, h_new
