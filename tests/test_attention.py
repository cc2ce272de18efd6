"""Attention mechanism tests incl. monotonicity on toy data (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.config import AttentionConfig
from gst_tacotron_tpu.models.attention import (
    BahdanauAttention,
    LocationSensitiveAttention,
    alignment_diagonality,
    init_attention_state,
)


def _run(attn_cls, cfg, batch=2, time=11, mdim=8, qdim=6):
    rng = np.random.default_rng(0)
    attn = attn_cls(cfg)
    memory = jnp.asarray(rng.standard_normal((batch, time, mdim)), jnp.float32)
    query = jnp.asarray(rng.standard_normal((batch, qdim)), jnp.float32)
    mask = jnp.arange(time)[None, :] < jnp.array([[time], [5]])[:, 0][:, None]
    state = init_attention_state(batch, time)

    def apply_fn(mdl, query, memory, mask, state):
        keys = mdl.precompute(memory)
        return mdl(query, memory, keys, mask, state)

    variables = attn.init(jax.random.PRNGKey(0), query, memory, mask, state,
                          method=apply_fn)
    return attn, variables, query, memory, mask, state, apply_fn


def test_bahdanau_masks_and_normalizes():
    cfg = AttentionConfig(kind="bahdanau", dim=16)
    attn, variables, q, mem, mask, state, fn = _run(BahdanauAttention, cfg)
    context, alignment, new_state = attn.apply(variables, q, mem, mask, state,
                                               method=fn)
    assert context.shape == (2, 8)
    assert alignment.shape == (2, 11)
    np.testing.assert_allclose(np.asarray(alignment.sum(-1)), 1.0, atol=1e-5)
    # masked positions get zero mass
    np.testing.assert_allclose(np.asarray(alignment[1, 5:]), 0.0, atol=1e-6)
    # cumulative accumulates
    np.testing.assert_allclose(
        np.asarray(new_state["cumulative"]),
        np.asarray(state["cumulative"] + alignment),
    )


def test_location_sensitive_uses_previous_alignment():
    cfg = AttentionConfig(kind="location_sensitive", dim=16,
                          location_filters=4, location_kernel_size=7)
    attn, variables, q, mem, mask, state, fn = _run(LocationSensitiveAttention, cfg)
    _, a1, _ = attn.apply(variables, q, mem, mask, state, method=fn)

    # a different previous alignment must change the scores
    state2 = dict(state)
    state2["alignment"] = jnp.roll(state["alignment"], 3, axis=-1)
    _, a2, _ = attn.apply(variables, q, mem, mask, state2, method=fn)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_diagonality_metric():
    b, s, t = 1, 20, 10
    # perfectly diagonal alignment
    diag = np.zeros((b, s, t), np.float32)
    for i in range(s):
        diag[0, i, min(int(i * t / s), t - 1)] = 1.0
    # uniform alignment
    uniform = np.full((b, s, t), 1.0 / t, np.float32)
    tl = jnp.array([t])
    fl = jnp.array([s])
    d_diag = float(alignment_diagonality(jnp.asarray(diag), tl, fl)[0])
    d_unif = float(alignment_diagonality(jnp.asarray(uniform), tl, fl)[0])
    assert d_diag > 0.95
    assert d_unif < d_diag
