"""Conv-bank-as-matmul vs naive K-convolution parity."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.models.modules import ConvBankBlock


def naive_bank(x, kernels):
    """Reference: K separate SAME conv1ds, concatenated."""
    outs = []
    for k_idx, w in enumerate(kernels):
        k = w.shape[0]
        pad_l, pad_r = (k - 1) // 2, k // 2
        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def test_bank_matmul_matches_convs():
    """The single masked bank_kernel matmul equals K separate SAME convs."""
    rng = np.random.default_rng(0)
    b, t, c, k, ch = 2, 11, 5, 6, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    bank = ConvBankBlock(k, ch)
    variables = bank.init(jax.random.PRNGKey(0), x, None, False)
    w_big = np.asarray(variables["params"]["bank_kernel"])
    mask = ConvBankBlock.tap_mask(k, c, ch)
    assert np.all(w_big[mask == 0] == 0)  # invalid taps zeroed at init

    # reconstruct the per-width kernels from the block matrix layout
    smin, smax = -((k - 1) // 2), k // 2
    nshift = smax - smin + 1
    w4 = w_big.reshape(nshift, c, k, ch)
    kernels = []
    for kk in range(1, k + 1):
        wk = np.zeros((kk, c, ch), np.float32)
        for si, s in enumerate(range(smin, smax + 1)):
            j = s + (kk - 1) // 2
            if 0 <= j < kk:
                wk[j] = w4[si, :, kk - 1, :]
        kernels.append(jnp.asarray(wk))
    ref = naive_bank(x, kernels)

    xp = jnp.pad(x, ((0, 0), (-smin, smax), (0, 0)))
    x_cat = jnp.concatenate(
        [xp[:, s - smin : s - smin + t] for s in range(smin, smax + 1)],
        axis=-1)
    got = x_cat @ w_big
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bank_module_forward_shapes_and_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 9, 8)), jnp.float32)
    lengths = jnp.array([9, 5])
    bank = ConvBankBlock(4, 8)
    variables = bank.init(jax.random.PRNGKey(0), x, lengths, True)
    out, mutated = bank.apply(variables, x, lengths, True,
                              mutable=["batch_stats"])
    assert out.shape == (2, 9, 32)

    def loss(params):
        y, _ = bank.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, lengths, True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_matmul_conv1d_matches_nn_conv():
    import flax.linen as nn
    from gst_tacotron_tpu.models.modules import MatmulConv1D

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 6)), jnp.float32)
    for k in (1, 3, 5, 31):
        m = MatmulConv1D(7, k)
        v = m.init(jax.random.PRNGKey(0), x)
        ref_conv = nn.Conv(7, (k,), padding="SAME", use_bias=False)
        ref = ref_conv.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        got = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=f"k={k}")


def test_matmul_conv2d_stride2_matches_nn_conv():
    import flax.linen as nn
    from gst_tacotron_tpu.models.modules import MatmulConv2DStride2

    rng = np.random.default_rng(3)
    for h, w, c in [(12, 8, 1), (13, 9, 4), (40, 80, 3)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        m = MatmulConv2DStride2(5)
        v = m.init(jax.random.PRNGKey(0), x)
        ref_conv = nn.Conv(5, (3, 3), strides=(2, 2), padding="SAME",
                           use_bias=False)
        ref = ref_conv.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        got = m.apply(v, x)
        assert got.shape == ref.shape, (h, w, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=f"{(h, w, c)}")
