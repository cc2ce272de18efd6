"""Chunked early-exit decode: parity with fixed scan + early-exit behavior +
distributed stop consensus."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.decode import chunked_decode, data_parallel_stop_consensus
from gst_tacotron_tpu.models import GSTTacotron
from gst_tacotron_tpu.text import NUM_SYMBOLS

from tests.test_model import make_batch, tiny_config


def setup_model(max_steps=12):
    cfg = apply_overrides(
        tiny_config("taco1_lj"), {"model.decoder.max_decode_steps": max_steps}
    )
    tokens, token_lengths, mel = make_batch(cfg)
    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, token_lengths, mel, train=False,
    )
    memory, _ = model.apply(
        variables, tokens, token_lengths, None, None, None, None, False,
        method=model._build_memory, rngs={"dropout": jax.random.PRNGKey(2)},
    )
    return cfg, model, variables, memory, token_lengths


def test_chunked_matches_shapes_and_runs_all_chunks():
    cfg, model, variables, memory, lengths = setup_model(max_steps=12)
    out = chunked_decode(model, variables, memory, lengths,
                         jax.random.PRNGKey(0), chunk_steps=4, max_steps=12)
    r = cfg.model.decoder.reduction_factor
    assert out["mel"].shape == (2, 12 * r, cfg.model.num_mels)
    assert out["alignments"].shape[1] == 12
    # untrained stop heads emit ~0.5 prob -> stops immediately, so the loop
    # exits after chunk 1 (early exit works)
    assert int(out["chunks_run"]) >= 1


def test_chunked_early_exit_skips_chunks():
    """With stop threshold 0 every step stops -> only one chunk runs."""
    cfg, model, variables, memory, lengths = setup_model(max_steps=16)
    cfg0 = apply_overrides(cfg, {"model.decoder.stop_threshold": 0.0})
    model0 = GSTTacotron(cfg0.model, NUM_SYMBOLS)
    out = chunked_decode(model0, variables, memory, lengths,
                         jax.random.PRNGKey(0), chunk_steps=4, max_steps=16)
    assert int(out["chunks_run"]) == 1
    # and with threshold 1.0 (never stop), all chunks run
    cfg1 = apply_overrides(cfg, {"model.decoder.stop_threshold": 1.0})
    model1 = GSTTacotron(cfg1.model, NUM_SYMBOLS)
    out1 = chunked_decode(model1, variables, memory, lengths,
                          jax.random.PRNGKey(0), chunk_steps=4, max_steps=16)
    assert int(out1["chunks_run"]) == 4
    assert np.all(np.asarray(out1["frame_lengths"]) == 16 * 2)


def test_chunked_decode_jits_once():
    cfg, model, variables, memory, lengths = setup_model(max_steps=8)
    calls = []

    @jax.jit
    def run(variables, memory, lengths, rng):
        calls.append(1)
        return chunked_decode(model, variables, memory, lengths, rng,
                              chunk_steps=4, max_steps=8)

    o1 = run(variables, memory, lengths, jax.random.PRNGKey(0))
    o2 = run(variables, memory, lengths, jax.random.PRNGKey(1))
    assert len(calls) == 1
    assert o1["mel"].shape == o2["mel"].shape


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_distributed_stop_consensus():
    from gst_tacotron_tpu.parallel import DATA_AXIS, make_mesh

    mesh = make_mesh(1)
    reduce = data_parallel_stop_consensus(DATA_AXIS)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(DATA_AXIS),
        out_specs=P(DATA_AXIS), check_vma=False,
    )
    def consensus(finished):
        return reduce(finished)

    # one shard not finished -> nobody may stop
    f = jnp.array([True] * 7 + [False])
    out = consensus(f)
    assert not np.any(np.asarray(out))
    # all finished -> everyone stops
    out2 = consensus(jnp.array([True] * 8))
    assert np.all(np.asarray(out2))
