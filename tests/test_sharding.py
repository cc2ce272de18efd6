"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4
"Distributed without a cluster"): mesh factory, TP param placement, sharded
train step with gradient DP, and decode-state collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gst_tacotron_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    describe_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake CPU devices"
)


def test_mesh_factory_shapes():
    mesh = make_mesh(model_parallelism=2)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(model_parallelism=3)


def test_param_sharding_rules():
    params = {
        "decoder": {"cell": {"frame_proj": {"kernel": np.zeros((8, 16)),
                                            "bias": np.zeros((16,))}}},
        "encoder": {"embedding": {"embedding": np.zeros((64, 8))}},
        "other": {"kernel": np.zeros((4, 4))},
    }
    desc = describe_sharding(params)
    assert "model" in desc["decoder/cell/frame_proj/kernel"]
    assert desc["decoder/cell/frame_proj/bias"] == "PartitionSpec()"
    assert "model" in desc["encoder/embedding/embedding"]
    assert desc["other/kernel"] == "PartitionSpec()"

    mesh = make_mesh(model_parallelism=2)
    sharded = shard_params(params, mesh)
    k = sharded["decoder"]["cell"]["frame_proj"]["kernel"]
    # output dim split over 2 model shards
    assert k.sharding.spec == P(None, MODEL_AXIS)


def test_sharded_train_step_runs_dp_and_tp(tmp_path):
    """Full train step jitted over a (4, 2) mesh on tiny shapes."""
    from gst_tacotron_tpu.config import apply_overrides, get_preset
    from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
    from gst_tacotron_tpu.data.loader import BucketedLoader, PatternDataset
    from gst_tacotron_tpu.train import Trainer

    ov = {
        "audio.n_fft": 512, "audio.hop_length": 128, "audio.win_length": 512,
        "model.num_freq": 257,
        "model.encoder.embedding_dim": 32, "model.encoder.prenet_dims": [32, 16],
        "model.encoder.cbhg_bank_k": 2, "model.encoder.cbhg_bank_channels": 16,
        "model.encoder.cbhg_proj_channels": [16, 16],
        "model.encoder.cbhg_highway_layers": 1,
        "model.encoder.cbhg_highway_dim": 16, "model.encoder.cbhg_gru_dim": 16,
        "model.gst.ref_conv_channels": [4, 8], "model.gst.ref_gru_dim": 16,
        "model.gst.style_dim": 16, "model.attention.dim": 16,
        "model.decoder.prenet_dims": [32, 16],
        "model.decoder.attention_rnn_dim": 16,
        "model.decoder.decoder_rnn_dim": 16,
        "model.postnet.cbhg_bank_k": 2, "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [16, 80],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 16, "model.postnet.cbhg_gru_dim": 16,
        "data.batch_size": 4, "data.buckets": [[128, 1024]],
    }
    cfg = apply_overrides(get_preset("gst_lj"), ov)
    patterns = str(tmp_path / "patterns")
    generate_patterns(synthetic_utterances(8), cfg.audio, patterns)

    mesh = make_mesh(model_parallelism=2)
    trainer = Trainer(cfg, patterns, str(tmp_path / "work"), mesh=mesh)
    batch = trainer._device_batch(next(iter(trainer.loader)))
    # batch is sharded over data axis
    assert batch["mel"].sharding.spec == P("data")
    state, metrics = trainer.step_fn(trainer.state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = trainer.step_fn(state, batch)
    assert np.isfinite(float(metrics2["loss"]))


def test_decode_state_collectives():
    """Distributed synthesis state exchange: stop-flag consensus via psum and
    context all-gather across the data axis (SURVEY.md §2.3)."""
    from functools import partial

    mesh = make_mesh(model_parallelism=1)  # 8-way data

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS, None)),
        out_specs=(P(), P(None, None)),
        check_vma=False,
    )
    def exchange(finished, context):
        total = jax.lax.psum(jnp.sum(finished.astype(jnp.int32)), DATA_AXIS)
        gathered = jax.lax.all_gather(context, DATA_AXIS, tiled=True)
        return jnp.reshape(total, (1,)), gathered

    finished = jnp.array([True] * 8)
    context = jnp.arange(16.0).reshape(8, 2)
    total, gathered = exchange(finished, context)
    assert int(total[0]) == 8
    assert gathered.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(context))


def _build_dist(preset="taco1_lj", overrides=None, model_parallelism=2):
    from gst_tacotron_tpu.config import apply_overrides
    from gst_tacotron_tpu.parallel.distributed_synthesis import (
        DistributedSynthesizer,
    )
    from gst_tacotron_tpu.models import GSTTacotron
    from gst_tacotron_tpu.text import NUM_SYMBOLS
    from tests.test_model import tiny_config

    cfg = tiny_config(preset)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(2, 40, (8, 8)), jnp.int32)
    lengths = jnp.asarray(np.array([8, 6, 8, 5, 8, 7, 8, 6], np.int32))
    mel = jnp.asarray(rng.random((8, 8, cfg.model.num_mels)), jnp.float32)

    model = GSTTacotron(cfg.model, NUM_SYMBOLS)
    kwargs = {}
    if cfg.model.gst.enabled:
        kwargs = dict(ref_mel=mel, ref_mel_lengths=jnp.full((8,), 8, jnp.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens, lengths, mel, train=False, **kwargs,
    )
    mesh = make_mesh(model_parallelism=model_parallelism)
    synth = DistributedSynthesizer(cfg, model, variables, mesh)
    return cfg, model, variables, synth, tokens, lengths, mel


def test_distributed_synthesizer():
    """Mesh-sharded synthesis: DP batch + TP params through one jitted infer."""
    cfg, _, _, synth, tokens, lengths, _ = _build_dist()
    out = synth(tokens, lengths, max_steps=4)
    assert out["mel"].shape == (8, 8, cfg.model.num_mels)
    assert np.all(np.isfinite(np.asarray(out["mel"], np.float32)))


def test_distributed_synthesizer_gst_inputs():
    """GST conditioning inputs (ref mel / token weights / speaker ids) ride
    the data axis with the batch (VERDICT r1 #6)."""
    cfg, _, _, synth, tokens, lengths, mel = _build_dist(
        "gst_multispeaker", {"model.num_speakers": 4})
    spk = jnp.asarray(np.arange(8) % 4, jnp.int32)

    out = synth(tokens, lengths, ref_mel=mel,
                ref_mel_lengths=jnp.full((8,), 8, jnp.int32),
                speaker_ids=spk, max_steps=4)
    assert out["mel"].shape == (8, 8, cfg.model.num_mels)
    assert out["style_attention"].shape[0] == 8
    assert np.all(np.isfinite(np.asarray(out["mel"], np.float32)))

    # token-weight-driven style (no reference audio)
    tw = jnp.asarray(
        np.full((8, cfg.model.gst.num_tokens),
                1.0 / cfg.model.gst.num_tokens, np.float32))
    out2 = synth(tokens, lengths, token_weights=tw, speaker_ids=spk,
                 max_steps=4)
    assert np.all(np.isfinite(np.asarray(out2["mel"], np.float32)))


@pytest.mark.parametrize("stop_threshold,expect_early", [(0.4, True),
                                                         (1.0, False)])
def test_distributed_chunked_consensus(stop_threshold, expect_early):
    """Chunked early-exit decode under shard_map: (a) outputs match the
    single-device chunked decode, (b) the while_loop exits on the same chunk
    on all shards — decided by the pmin stop consensus (VERDICT r1 #6)."""
    from gst_tacotron_tpu.decode import chunked_decode

    cfg, model, variables, synth, tokens, lengths, _ = _build_dist(
        "taco1_lj", {"model.decoder.stop_threshold": stop_threshold,
                     "model.decoder.max_decode_steps": 8},
        model_parallelism=1,
    )
    out = synth(tokens, lengths, max_steps=8, chunked=True, chunk_steps=2,
                deterministic_prenet=True, seed=3)

    # single-device reference: same math, no mesh
    memory, _ = model.apply(
        variables, tokens, lengths, None, None, None, None, False, True,
        method=model._build_memory,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    ref = chunked_decode(
        model, variables, memory, lengths, jax.random.PRNGKey(0),
        chunk_steps=2, max_steps=8, deterministic_prenet=True,
    )
    n_chunks_dist = int(out["chunks_run"])
    n_chunks_ref = int(ref["chunks_run"])
    assert n_chunks_dist == n_chunks_ref
    if expect_early:
        assert n_chunks_dist < 4  # exited before the chunk budget
    else:
        assert n_chunks_dist == 4
    np.testing.assert_array_equal(np.asarray(out["frame_lengths"]),
                                  np.asarray(ref["frame_lengths"]))
    np.testing.assert_allclose(np.asarray(out["mel"], np.float32),
                               np.asarray(ref["mel"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["alignments"], np.float32),
                               np.asarray(ref["alignments"]), atol=1e-5)


def test_distributed_chunked_requires_pure_dp():
    _, _, _, synth, tokens, lengths, _ = _build_dist(model_parallelism=2)
    with pytest.raises(ValueError, match="model_parallelism=1"):
        synth(tokens, lengths, max_steps=4, chunked=True)


def test_device_corpus_sharded_train_step(tmp_path):
    """device_corpus under a (data, model) mesh: corpus replicated, idx
    sharded over data, two steps run and losses stay finite."""
    from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
    from gst_tacotron_tpu.parallel import make_mesh
    from gst_tacotron_tpu.train import Trainer
    from tests.test_wav_transport import small_cfg

    patterns = str(tmp_path / "p")
    cfg = small_cfg("gst_lj", wav_transport=True,
                    **{"data.device_corpus": True, "data.batch_size": 4})
    generate_patterns(synthetic_utterances(8), cfg.audio, patterns,
                      store_wav=True)
    mesh = make_mesh(2)
    tr = Trainer(cfg, patterns, str(tmp_path / "w"), mesh=mesh)
    assert tr.corpus is not None
    state = tr.train(total_steps=2)
    assert int(state.step) == 2
