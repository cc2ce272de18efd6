"""TF-checkpoint importer conversion semantics (no TF load needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.models.rnn import GRUCell
from gst_tacotron_tpu.tf_import import (
    convert_keras_batchnorm,
    convert_keras_gru,
    set_in_tree,
)


def test_convert_keras_gru_matches_our_cell():
    """A Keras-v2 GRU forward computed by hand must equal our GRUCell with
    the converted params (gate order [z,r,n], reset_after semantics)."""
    rng = np.random.default_rng(0)
    d, h = 3, 4
    kernel = rng.standard_normal((d, 3 * h)).astype(np.float32)
    rec_kernel = rng.standard_normal((h, 3 * h)).astype(np.float32)
    bias = rng.standard_normal((2, 3 * h)).astype(np.float32)

    params = convert_keras_gru(kernel, rec_kernel, bias)

    x = rng.standard_normal((2, d)).astype(np.float32)
    hid = rng.standard_normal((2, h)).astype(np.float32)

    # Keras v2 reference computation
    gx = x @ kernel + bias[0]
    gh = hid @ rec_kernel + bias[1]
    xz, xr, xn = np.split(gx, 3, -1)
    hz, hr, hn = np.split(gh, 3, -1)
    z = 1 / (1 + np.exp(-(xz + hz)))
    r = 1 / (1 + np.exp(-(xr + hr)))
    n = np.tanh(xn + r * hn)
    expected = z * hid + (1 - z) * n

    cell = GRUCell(h)
    ours, _ = cell.apply({"params": params}, jnp.asarray(hid), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_convert_batchnorm():
    g, b, m, v = (np.ones(4), np.zeros(4), np.full(4, 2.0), np.full(4, 3.0))
    params, stats = convert_keras_batchnorm(g, b, m, v)
    assert set(params) == {"scale", "bias"}
    assert set(stats) == {"mean", "var"}
    np.testing.assert_array_equal(stats["mean"], m)


def test_set_in_tree():
    tree = {}
    set_in_tree(tree, "a/b/c", np.zeros(2))
    set_in_tree(tree, "a/b/d", np.ones(2))
    assert set(tree["a"]["b"]) == {"c", "d"}
