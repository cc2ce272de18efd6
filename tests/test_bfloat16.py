"""bfloat16 compute-path test: forward/train step run and stay finite, and
stay in the neighborhood of the float32 result."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.train import init_state, make_optimizer, train_step

from tests.test_model import tiny_config, make_batch


def test_bf16_train_step_finite():
    # taco1 (no GST) keeps this compile small; the GST bf16 path is covered
    # by the forward test below plus the f32 GST train tests
    cfg = apply_overrides(tiny_config("taco1_lj"),
                          {"model.compute_dtype": "bfloat16"})
    tokens, token_lengths, mel = make_batch(cfg)
    batch = {
        "tokens": tokens, "token_lengths": token_lengths,
        "mel": mel, "mel_lengths": jnp.array([8, 8]),
        "linear": jnp.zeros((2, 8, cfg.model.num_freq)),
        "speaker_ids": jnp.zeros((2,), jnp.int32),
    }
    model, state = init_state(cfg, jax.random.PRNGKey(0), batch)
    # params remain float32 even with bf16 compute
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)

    tx = make_optimizer(cfg.optimizer)
    state2, metrics = train_step(model, tx, cfg, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_bf16_forward_close_to_f32():
    cfg32 = tiny_config("taco1_lj")
    cfg16 = apply_overrides(cfg32, {"model.compute_dtype": "bfloat16"})
    tokens, token_lengths, mel = make_batch(cfg32)
    batch = {
        "tokens": tokens, "token_lengths": token_lengths,
        "mel": mel, "mel_lengths": jnp.array([8, 8]),
        "linear": jnp.zeros((2, 8, cfg32.model.num_freq)),
        "speaker_ids": jnp.zeros((2,), jnp.int32),
    }
    from gst_tacotron_tpu.train import build_model

    m32, s32 = init_state(cfg32, jax.random.PRNGKey(0), batch)
    m16 = build_model(cfg16)
    out32 = m32.apply(
        {"params": s32.params, "batch_stats": s32.batch_stats},
        tokens, token_lengths, mel, train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out16 = m16.apply(
        {"params": s32.params, "batch_stats": s32.batch_stats},
        tokens, token_lengths, mel, train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    a, b = np.asarray(out32["mel"]), np.asarray(out16["mel"], np.float32)
    assert np.all(np.isfinite(b))
    # loose: bf16 has ~3 decimal digits
    assert np.mean(np.abs(a - b)) < 0.05
