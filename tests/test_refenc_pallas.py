"""Fused reference-encoder kernel parity (interpreter mode on CPU;
SURVEY.md §4 "Pallas kernel vs jnp-reference kernel allclose"; VERDICT r2
#2b — the fused conv-stack kernel vs the flax module)."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.config import GSTConfig
from gst_tacotron_tpu.models.gst import GST, ReferenceEncoder
from gst_tacotron_tpu.ops.refenc_pallas import (
    gst_style_from_params,
    ref_encoder_pallas,
)

CFG = GSTConfig(ref_conv_channels=(4, 4, 8), ref_gru_dim=8, style_dim=8,
                num_tokens=5, num_heads=2)
NUM_MELS = 16


def _init_ref_encoder(b=2, t=21):
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.normal(0, 1, (b, t, NUM_MELS)), jnp.float32)
    lengths = jnp.asarray([t, t - 6], jnp.int32)
    model = ReferenceEncoder(CFG, NUM_MELS)
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel, lengths,
                           train=False)
    # non-identity BN statistics so folding matters
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])
    for i in range(len(CFG.ref_conv_channels)):
        c = stats[f"bn_{i}"]["mean"].shape[0]
        stats[f"bn_{i}"]["mean"] = jnp.asarray(
            rng.normal(0, 0.3, (c,)), jnp.float32)
        stats[f"bn_{i}"]["var"] = jnp.asarray(
            rng.uniform(0.5, 2.0, (c,)), jnp.float32)
    return model, variables["params"], stats, mel, lengths


def test_refenc_kernel_matches_flax_module():
    model, params, stats, mel, lengths = _init_ref_encoder()
    expected = model.apply({"params": params, "batch_stats": stats},
                           mel, lengths, train=False)
    got = ref_encoder_pallas(params, stats, CFG, mel, lengths,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_refenc_kernel_odd_time_no_mask():
    model, params, stats, mel, _ = _init_ref_encoder(t=19)
    expected = model.apply({"params": params, "batch_stats": stats},
                           mel, None, train=False)
    got = ref_encoder_pallas(params, stats, CFG, mel, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_refenc_batched_kernel_matches_flax_module():
    # t % 2**n_layers == 0 routes ref_encoder_pallas to the whole-batch
    # 3-matmul-per-layer kernel (refenc_stack_pallas_batched)
    model, params, stats, mel, lengths = _init_ref_encoder(b=2, t=24)
    lengths = jnp.asarray([24, 7], jnp.int32)
    expected = model.apply({"params": params, "batch_stats": stats},
                           mel, lengths, train=False)
    got = ref_encoder_pallas(params, stats, CFG, mel, lengths,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_refenc_batched_kernel_bf16_close():
    """Opt-in bf16 operands (the r4 floor-analysis fix — the kernel is
    compute-bound on its inflated dense-banded FLOPs, so the MXU's double
    bf16 rate is the remaining lever): the GRU-state embedding must stay
    close to the f32 kernel; exactness is not expected."""
    model, params, stats, mel, lengths = _init_ref_encoder(b=2, t=24)
    f32 = ref_encoder_pallas(params, stats, CFG, mel, lengths,
                             interpret=True)
    b16 = ref_encoder_pallas(params, stats, CFG, mel, lengths,
                             interpret=True, bf16=True)
    a, b = np.asarray(f32), np.asarray(b16)
    # tanh-bounded GRU state: absolute tolerance is the meaningful one
    assert np.max(np.abs(a - b)) < 0.05, np.max(np.abs(a - b))
    cos = np.sum(a * b, -1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)
    assert np.all(cos > 0.995), cos


def test_refenc_batched_kernel_flagship_shape():
    # the production 6-layer stack at (B, 256, 80): exercises the odd-width
    # SAME-pad layer (w=5 -> pl_w=1) and the deep pad-row halving chain
    cfg = GSTConfig()  # default channels (32, 32, 64, 64, 128, 128)
    rng = np.random.default_rng(23)
    b, t, f = 2, 256, 80
    mel = jnp.asarray(rng.normal(0, 1, (b, t, f)), jnp.float32)
    model = ReferenceEncoder(cfg, f)
    variables = model.init({"params": jax.random.PRNGKey(5)}, mel, None,
                           train=False)
    expected = model.apply(variables, mel, None, train=False)
    got = ref_encoder_pallas(variables["params"], variables["batch_stats"],
                             cfg, mel, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)


def test_gst_style_from_params_matches_flax_gst():
    rng = np.random.default_rng(13)
    b, t = 2, 21
    mel = jnp.asarray(rng.normal(0, 1, (b, t, NUM_MELS)), jnp.float32)
    lengths = jnp.asarray([t, t - 5], jnp.int32)
    gst = GST(CFG, NUM_MELS)
    variables = gst.init({"params": jax.random.PRNGKey(1)}, mel, lengths,
                         train=False)
    full = {
        "params": {"gst": variables["params"]},
        "batch_stats": {"gst": variables["batch_stats"]},
    }
    style_ref, attn_ref = gst.apply(variables, mel, lengths, train=False)
    style, attn = gst_style_from_params(full, CFG, mel, lengths,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(style), np.asarray(style_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                               atol=1e-5)


def test_gst_style_token_weights_path():
    rng = np.random.default_rng(17)
    b, t = 2, 12
    mel = jnp.asarray(rng.normal(0, 1, (b, t, NUM_MELS)), jnp.float32)
    gst = GST(CFG, NUM_MELS)
    variables = gst.init({"params": jax.random.PRNGKey(2)}, mel, None,
                         train=False)
    full = {
        "params": {"gst": variables["params"]},
        "batch_stats": {"gst": variables["batch_stats"]},
    }
    w = jnp.asarray(rng.dirichlet(np.ones(CFG.num_tokens), b), jnp.float32)
    style_ref, _ = gst.apply(variables, None, None, w, train=False)
    style, _ = gst_style_from_params(full, CFG, None, None, w,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(style), np.asarray(style_ref),
                               atol=1e-5)
