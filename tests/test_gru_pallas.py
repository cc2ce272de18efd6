"""Pallas GRU scan kernel vs lax.scan GRU (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.models.rnn import GRU, BiGRU
from gst_tacotron_tpu.ops.gru_pallas import gru_scan_pallas


def make(b=3, t=7, d=5, h=4, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lengths = jnp.asarray(rng.integers(2, t + 1, (b,)), jnp.int32)
    gru = GRU(h, allow_pallas=False)
    variables = gru.init(jax.random.PRNGKey(0), xs, lengths)
    return gru, variables, xs, lengths


def _kernel_out(variables, xs, lengths, h, reverse=False):
    p = variables["params"]
    return gru_scan_pallas(
        xs, jnp.zeros((xs.shape[0], h), jnp.float32),
        p["kernel"], p["bias"], p["recurrent_kernel"], p["recurrent_bias"],
        lengths=lengths, reverse=reverse, interpret=True,
    )


def test_forward_matches_scan():
    gru, variables, xs, lengths = make()
    ys_ref, fin_ref = gru.apply(variables, xs, lengths, train=True)
    ys_k, fin_k = _kernel_out(variables, xs, lengths, 4)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref), atol=1e-5)


def test_reverse_matches_scan():
    gru, variables, xs, lengths = make()
    rgru = GRU(4, reverse=True, allow_pallas=False)
    ys_ref, fin_ref = rgru.apply(variables, xs, lengths, train=True)
    ys_k, fin_k = _kernel_out(variables, xs, lengths, 4, reverse=True)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref), atol=1e-5)


def test_no_lengths():
    gru, variables, xs, _ = make()
    ys_ref, fin_ref = gru.apply(variables, xs, train=True)
    ys_k, fin_k = _kernel_out(variables, xs, None, 4)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_ref), atol=1e-5)


def test_bigru_param_layout_unchanged_semantics():
    """BiGRU still produces masked/flip-consistent outputs after the GRU
    refactor (params now live directly on the GRU module)."""
    rng = np.random.default_rng(1)
    xs_full = jnp.asarray(rng.standard_normal((1, 5, 3)), jnp.float32)
    lengths = jnp.array([5])
    bigru = BiGRU(6)
    variables = bigru.init(jax.random.PRNGKey(0), xs_full, lengths)
    p = variables["params"]
    assert set(p) == {"forward", "backward"}
    assert set(p["forward"]) == {"kernel", "recurrent_kernel", "bias",
                                 "recurrent_bias"}
    xs_padded = jnp.concatenate([xs_full, jnp.zeros((1, 3, 3))], axis=1)
    out_full, _ = bigru.apply(variables, xs_full, lengths, train=True)
    out_padded, _ = bigru.apply(variables, xs_padded, jnp.array([5]), train=True)
    np.testing.assert_allclose(out_full[0], out_padded[0, :5], atol=1e-5)
