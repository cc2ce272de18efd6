"""Module-level shape/dtype/semantics tests (SURVEY.md §4 "Unit")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import EncoderConfig, GSTConfig, PostnetConfig
from gst_tacotron_tpu.models import (
    BiGRU,
    CBHG,
    GRU,
    GRUCell,
    GST,
    Highway,
    PostCBHG,
    Prenet,
    ReferenceEncoder,
    StyleTokenLayer,
    Taco1Encoder,
)


def init_and_run(module, rngs, *args, **kwargs):
    variables = module.init(rngs, *args, **kwargs)
    out = module.apply(variables, *args, rngs={"dropout": jax.random.PRNGKey(9)},
                       **kwargs, mutable=["batch_stats"])
    return out[0] if isinstance(out, tuple) and len(out) == 2 else out


def test_gru_cell_matches_keras_semantics():
    """Hand-check the reset_after GRU math on a tiny case."""
    cell = GRUCell(4)
    x = jnp.ones((2, 3))
    h = jnp.zeros((2, 4))
    variables = cell.init(jax.random.PRNGKey(0), h, x)
    h_new, y = cell.apply(variables, h, x)
    assert h_new.shape == (2, 4)
    np.testing.assert_allclose(h_new, y)

    # manual recompute
    p = variables["params"]
    gx = x @ p["kernel"] + p["bias"]
    gh = h @ p["recurrent_kernel"] + p["recurrent_bias"]
    xz, xr, xn = np.split(np.asarray(gx), 3, axis=-1)
    hz, hr, hn = np.split(np.asarray(gh), 3, axis=-1)
    z = 1 / (1 + np.exp(-(xz + hz)))
    r = 1 / (1 + np.exp(-(xr + hr)))
    n = np.tanh(xn + r * hn)
    expected = z * np.asarray(h) + (1 - z) * n
    np.testing.assert_allclose(np.asarray(h_new), expected, atol=1e-6)


def test_gru_masking_freezes_state():
    gru = GRU(8)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 4)), jnp.float32)
    lengths = jnp.array([10, 4])
    variables = gru.init(jax.random.PRNGKey(0), xs, lengths)
    ys, final = gru.apply(variables, xs, lengths)
    assert ys.shape == (2, 10, 8)
    # past the length, outputs equal the state at the last valid step
    np.testing.assert_allclose(ys[1, 4], ys[1, 3], atol=1e-6)
    np.testing.assert_allclose(ys[1, 9], ys[1, 3], atol=1e-6)
    np.testing.assert_allclose(final[1], ys[1, 3], atol=1e-6)


def test_bigru_reverse_respects_lengths():
    """The backward pass of a masked BiGRU must start at each utterance's true
    last frame, so short-sequence outputs are unaffected by pad frames."""
    bigru = BiGRU(6)
    rng = np.random.default_rng(1)
    xs_full = jnp.asarray(rng.standard_normal((1, 5, 3)), jnp.float32)
    lengths = jnp.array([5])
    variables = bigru.init(jax.random.PRNGKey(0), xs_full, lengths)

    # same data with extra pad frames must give identical valid outputs
    xs_padded = jnp.concatenate([xs_full, jnp.zeros((1, 3, 3))], axis=1)
    out_full, _ = bigru.apply(variables, xs_full, lengths)
    out_padded, _ = bigru.apply(variables, xs_padded, jnp.array([5]))
    np.testing.assert_allclose(out_full[0], out_padded[0, :5], atol=1e-5)


def test_prenet_dropout_always_on():
    prenet = Prenet((16, 8), dropout_rate=0.5)
    x = jnp.ones((4, 10))
    variables = prenet.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y1 = prenet.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = prenet.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(3)})
    # stochastic even without train flag (reference Tacotron trait)
    assert not np.allclose(y1, y2)
    # deterministic escape hatch
    y3 = prenet.apply(variables, x, deterministic=True)
    y4 = prenet.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(y3, y4)


def test_highway_identity_bias():
    hw = Highway(8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)), jnp.float32)
    variables = hw.init(jax.random.PRNGKey(0), x)
    y = hw.apply(variables, x)
    assert y.shape == x.shape


def test_cbhg_shapes_and_padding_invariance():
    cbhg = CBHG(bank_k=4, bank_channels=16, proj_channels=(16, 16),
                highway_layers=2, highway_dim=16, gru_dim=8)
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    lengths = jnp.array([12, 7])
    variables = cbhg.init(jax.random.PRNGKey(0), xs, lengths, train=False)
    ys = cbhg.apply(variables, xs, lengths, train=False)
    assert ys.shape == (2, 12, 16)

    # appending pad frames to the short utterance must not change its output
    xs2 = xs.at[1, 7:].set(99.0)  # garbage in the pad region
    ys2 = cbhg.apply(variables, xs2, lengths, train=False)
    np.testing.assert_allclose(ys[1, :7], ys2[1, :7], atol=1e-5)


def test_taco1_encoder_output_dim():
    cfg = EncoderConfig(cbhg_bank_k=4, cbhg_bank_channels=16, cbhg_gru_dim=32,
                        embedding_dim=32, prenet_dims=(32, 16),
                        cbhg_proj_channels=(16, 16), cbhg_highway_dim=16)
    enc = Taco1Encoder(cfg, num_symbols=70)
    tokens = jnp.array([[5, 6, 7, 8, 1, 0, 0], [9, 10, 1, 0, 0, 0, 0]])
    lengths = jnp.array([5, 3])
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, lengths, train=False,
    )
    out = enc.apply(variables, tokens, lengths, train=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 7, cfg.output_dim)
    # pad positions are zeroed
    np.testing.assert_allclose(out[1, 3:], 0.0, atol=1e-7)


def test_reference_encoder_shape():
    cfg = GSTConfig(enabled=True, ref_conv_channels=(8, 8, 16), ref_gru_dim=16)
    refenc = ReferenceEncoder(cfg, num_mels=80)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 80)),
                      jnp.float32)
    variables = refenc.init(jax.random.PRNGKey(0), mel, jnp.array([40, 17]),
                            train=False)
    out = refenc.apply(variables, mel, jnp.array([40, 17]), train=False)
    assert out.shape == (2, 16)


def test_style_token_layer():
    cfg = GSTConfig(enabled=True, num_tokens=10, num_heads=4, style_dim=32)
    stl = StyleTokenLayer(cfg)
    ref = jnp.asarray(np.random.default_rng(0).standard_normal((3, 16)), jnp.float32)
    variables = stl.init(jax.random.PRNGKey(0), ref)
    style, attn = stl.apply(variables, ref)
    assert style.shape == (3, 32)
    assert attn.shape == (3, 4, 10)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)

    # explicit token weights override attention
    w = jnp.zeros((3, 10)).at[:, 2].set(1.0)
    style_w, attn_w = stl.apply(variables, ref, w)
    np.testing.assert_allclose(np.asarray(attn_w[:, 0, 2]), 1.0)


def test_postnet_shape():
    cfg = PostnetConfig(cbhg_bank_k=2, cbhg_bank_channels=16,
                        cbhg_proj_channels=(16, 8), cbhg_highway_layers=1,
                        cbhg_highway_dim=16, cbhg_gru_dim=16)
    post = PostCBHG(cfg, num_freq=257)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 8)),
                      jnp.float32)
    variables = post.init(jax.random.PRNGKey(0), mel, train=False)
    out = post.apply(variables, mel, train=False)
    assert out.shape == (2, 20, 257)


def test_guided_attention_loss_prefers_diagonal():
    import jax.numpy as jnp
    from gst_tacotron_tpu.losses import guided_attention_loss

    b, s_dim, t_dim = 2, 20, 10
    diag = np.zeros((b, s_dim, t_dim), np.float32)
    anti = np.zeros((b, s_dim, t_dim), np.float32)
    for s in range(s_dim):
        diag[:, s, int(s / s_dim * t_dim)] = 1.0
        anti[:, s, t_dim - 1 - int(s / s_dim * t_dim)] = 1.0
    tl = np.full((b,), t_dim, np.int32)
    ml = np.full((b,), s_dim * 2, np.int32)  # r=2
    lo = guided_attention_loss(jnp.asarray(diag), tl, ml, 2, 0.2)
    hi = guided_attention_loss(jnp.asarray(anti), tl, ml, 2, 0.2)
    assert float(lo) < 0.1 and float(hi) > 0.5


def test_guided_attention_in_compute_losses():
    import jax.numpy as jnp
    from gst_tacotron_tpu.config import AudioConfig, LossConfig
    from gst_tacotron_tpu.losses import compute_losses

    b, s_dim, t_dim, r, m, f = 2, 8, 5, 2, 8, 9
    rng = np.random.default_rng(0)
    outputs = {
        "mel": jnp.asarray(rng.random((b, s_dim * r, m), np.float32)),
        "linear": jnp.asarray(rng.random((b, s_dim * r, f), np.float32)),
        "stop_logits": jnp.zeros((b, s_dim * r), np.float32),
        "alignments": jnp.asarray(
            rng.dirichlet(np.ones(t_dim), (b, s_dim)).astype(np.float32)),
    }
    batch = {
        "mel": outputs["mel"], "linear": outputs["linear"],
        "mel_lengths": np.full((b,), s_dim * r, np.int32),
        "token_lengths": np.full((b,), t_dim, np.int32),
    }
    off = compute_losses(outputs, batch, LossConfig(), AudioConfig())
    on = compute_losses(
        outputs, batch,
        LossConfig(guided_attention_weight=0.5), AudioConfig())
    assert "guided_loss" not in off
    assert float(on["guided_loss"]) > 0.0
    assert float(on["loss"]) > float(off["loss"])
