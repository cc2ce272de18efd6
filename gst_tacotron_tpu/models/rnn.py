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


class GRU(nn.Module):
    """Unidirectional GRU over (B, T, D) -> ((B, T, H), final (B, H)).

    Owns its parameters directly (same Keras-v2 layout as GRUCell) so the
    recurrence is a plain `lax.scan` over a closure — and, at inference on
    TPU, the whole scan can route through the Pallas GRU kernel
    (ops/gru_pallas.py) which keeps the weights VMEM-resident across steps
    (the per-step kernel-launch overhead of scan on this runtime dominates
    otherwise; see CLAUDE.md). The kernel path has no VJP — training always
    uses the scan (pass train=True from callers).

    Masked (padded) steps hold the carry constant, so the final state is the
    state at each sequence's true last step.
    """

    features: int
    reverse: bool = False
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None,
                 *, train: bool = False):
        assert self.reset_after, "pallas/scan paths implement reset_after=True"
        hdim = self.features
        in_dim = xs.shape[-1]
        wi = self.param("kernel", nn.initializers.glorot_uniform(),
                        (in_dim, 3 * hdim))
        wh = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                        (hdim, 3 * hdim))
        bi = self.param("bias", nn.initializers.zeros, (3 * hdim,))
        bh = self.param("recurrent_bias", nn.initializers.zeros, (3 * hdim,))

        batch, time = xs.shape[0], xs.shape[1]
        h0 = initial_state
        if h0 is None:
            h0 = jnp.zeros((batch, hdim), self.dtype)

        # Platform gating at trace time: jax_default_device (set by
        # `with jax.default_device(cpu)` — the bench/CLI pattern for host-side
        # init in a TPU process) takes precedence over the process default
        # backend. Neither signal sees per-array placement; callers that need
        # the scan path regardless pass allow_pallas=False.
        default_dev = jax.config.jax_default_device
        platform = (
            getattr(default_dev, "platform", None) or jax.default_backend()
        )
        use_pallas = (
            self.allow_pallas and not train and platform not in ("cpu",)
        )
        if use_pallas:
            from ..ops.gru_pallas import gru_scan_pallas

            ys, final = gru_scan_pallas(
                xs.astype(jnp.float32), h0.astype(jnp.float32),
                wi.astype(jnp.float32), bi.astype(jnp.float32),
                wh.astype(jnp.float32), bh.astype(jnp.float32),
                lengths=lengths, reverse=self.reverse,
            )
            return ys.astype(self.dtype), final.astype(self.dtype)

        mask = None
        if lengths is not None:
            mask = (jnp.arange(time)[None, :] < lengths[:, None]).astype(
                self.dtype)
        if self.reverse:
            xs = jnp.flip(xs, axis=1)
            if mask is not None:
                mask = jnp.flip(mask, axis=1)

        dt = self.dtype
        wi_c, wh_c = wi.astype(dt), wh.astype(dt)
        bi_c, bh_c = bi.astype(dt), bh.astype(dt)

        def step(h, inputs):
            x, m = inputs
            gx = x.astype(dt) @ wi_c + bi_c
            gh = h @ wh_c + bh_c
            xz, xr, xn = jnp.split(gx, 3, axis=-1)
            hz, hr, hn = jnp.split(gh, 3, axis=-1)
            z = jax.nn.sigmoid(xz + hz)
            r = jax.nn.sigmoid(xr + hr)
            n = jnp.tanh(xn + r * hn)
            h_new = z * h + (1.0 - z) * n
            if m is not None:
                keep = m[:, None]
                h_new = keep * h_new + (1.0 - keep) * h
            return h_new, h_new

        xs_t = jnp.moveaxis(xs, 1, 0)
        mask_t = None if mask is None else jnp.moveaxis(mask, 1, 0)
        final, ys = jax.lax.scan(step, h0, (xs_t, mask_t))
        ys = jnp.moveaxis(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, final


class BiGRU(nn.Module):
    """Bidirectional GRU; output concat -> (B, T, 2H)."""

    features: int
    reset_after: bool = True
    dtype: jnp.dtype = jnp.float32
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 *, train: bool = False):
        fwd, fwd_final = GRU(self.features, reverse=False, reset_after=self.reset_after,
                             dtype=self.dtype, allow_pallas=self.allow_pallas,
                             name="forward")(xs, lengths, train=train)
        bwd, bwd_final = GRU(self.features, reverse=True, reset_after=self.reset_after,
                             dtype=self.dtype, allow_pallas=self.allow_pallas,
                             name="backward")(xs, lengths, train=train)
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
