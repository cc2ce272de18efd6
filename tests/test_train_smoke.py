"""End-to-end smoke: pattern gen -> train a few steps -> checkpoint ->
restore -> synthesize a WAV (SURVEY.md §4 "Integration"; config 1 is
explicitly required to be CPU-runnable, BASELINE.json:7)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import AudioConfig, apply_overrides, get_preset
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.train import Trainer, init_state, make_optimizer, make_schedule
from gst_tacotron_tpu.synthesize import Synthesizer

FAST_AUDIO = dict(
    n_fft=512, hop_length=128, win_length=512, griffin_lim_iters=4
)


def small_cfg(preset="taco1_lj", **extra):
    ov = {
        "audio.n_fft": 512,
        "audio.hop_length": 128,
        "audio.win_length": 512,
        "audio.griffin_lim_iters": 4,
        "model.num_freq": 257,
        "model.encoder.embedding_dim": 32,
        "model.encoder.prenet_dims": [32, 16],
        "model.encoder.cbhg_bank_k": 4,
        "model.encoder.cbhg_bank_channels": 16,
        "model.encoder.cbhg_proj_channels": [16, 16],
        "model.encoder.cbhg_highway_layers": 2,
        "model.encoder.cbhg_highway_dim": 16,
        "model.encoder.cbhg_gru_dim": 16,
        "model.gst.ref_conv_channels": [4, 8, 16],
        "model.gst.ref_gru_dim": 16,
        "model.gst.style_dim": 16,
        "model.attention.dim": 16,
        "model.decoder.prenet_dims": [32, 16],
        "model.decoder.attention_rnn_dim": 16,
        "model.decoder.decoder_rnn_dim": 16,
        "model.decoder.max_decode_steps": 10,
        "model.postnet.cbhg_bank_k": 2,
        "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [16, 80],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 16,
        "model.postnet.cbhg_gru_dim": 16,
        "data.batch_size": 2,
        "data.buckets": [[128, 1024]],
        "train.log_every": 2,
        "train.checkpoint_every": 4,
        "train.eval_every": 1000,
    }
    ov.update(extra)
    return apply_overrides(get_preset(preset), ov)


@pytest.fixture(scope="module")
def pattern_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("patterns"))
    cfg = small_cfg()
    generate_patterns(synthetic_utterances(8, num_speakers=1), cfg.audio, out)
    return out


def test_schedule_shapes():
    from gst_tacotron_tpu.config import OptimizerConfig

    sched = make_schedule(OptimizerConfig(learning_rate=1e-3, warmup_steps=100))
    lr_early = float(sched(jnp.asarray(10)))
    lr_peak = float(sched(jnp.asarray(100)))
    lr_late = float(sched(jnp.asarray(10000)))
    assert lr_early < lr_peak
    assert lr_late < lr_peak


def test_train_loss_decreases_and_resumes(pattern_dir, tmp_path):
    cfg = small_cfg()
    work = str(tmp_path / "work")
    trainer = Trainer(cfg, pattern_dir, work)
    state0_loss = None

    # capture first-step loss by running the step fn manually (the step
    # donates its input state, so reassign the returned state)
    it = iter(trainer.loader)
    batch = trainer._device_batch(next(it))
    trainer.state, metrics = trainer.step_fn(trainer.state, batch)
    first_loss = float(metrics["loss"])
    assert np.isfinite(first_loss)

    final_state = trainer.train(total_steps=8)
    assert int(final_state.step) == 8

    # checkpoint restore round-trip
    trainer2 = Trainer(cfg, pattern_dir, work)
    assert trainer2.restore_if_available()
    assert int(trainer2.state.step) == 8
    p1 = jax.tree_util.tree_leaves(jax.device_get(final_state.params))
    p2 = jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_synthesize_from_trained_state(pattern_dir, tmp_path):
    cfg = small_cfg()
    work = str(tmp_path / "work_synth")
    trainer = Trainer(cfg, pattern_dir, work)
    state = trainer.train(total_steps=2)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    synth = Synthesizer(cfg, trainer.model, variables)
    out = synth(["hello world.", "a longer test sentence here."])
    assert out["wav"].shape[0] == 2
    assert np.all(np.isfinite(out["wav"]))
    assert out["mel"].shape[-1] == cfg.model.num_mels
    assert out["alignments"].shape[0] == 2
    assert np.all(out["frame_lengths"] >= 1)
    assert out["diagonality"].shape == (2,)

    paths = synth.save_outputs(out, str(tmp_path / "artifacts"))
    wavs = [p for p in paths if p.endswith(".wav")]
    assert len(wavs) == 2
    assert all(os.path.getsize(p) > 100 for p in wavs)


def test_train_gst_smoke(pattern_dir, tmp_path):
    cfg = small_cfg("gst_lj")
    trainer = Trainer(cfg, pattern_dir, str(tmp_path / "work_gst"))
    state = trainer.train(total_steps=2)
    assert int(state.step) == 2


def test_heldout_eval_runs(pattern_dir, tmp_path):
    """val_fraction carves a deterministic holdout; the wired eval_step
    produces finite teacher-forced losses (VERDICT r1 #10)."""
    cfg = small_cfg(**{"data.val_fraction": 0.3, "loss.stop_masked": True,
                       "train.eval_every": 1000})
    trainer = Trainer(cfg, pattern_dir, str(tmp_path / "work_eval"))
    assert trainer.val_loader is not None
    # train and val see disjoint utterances
    train_ids = {i for m in trainer.loader.bucket_members for i in m}
    val_ids = {i for m in trainer.val_loader.bucket_members for i in m}
    assert val_ids and train_ids.isdisjoint(val_ids)

    metrics = trainer.run_eval(step=0, max_batches=2)
    assert metrics and all(np.isfinite(v) for v in metrics.values())
    assert "eval_loss" in metrics
