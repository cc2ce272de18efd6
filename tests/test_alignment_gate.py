"""Alignment-stress regression gate (SURVEY.md §4 "Alignment stress",
BASELINE config 3; VERDICT r1 #9).

Trains the config-3 decoder stack (location-sensitive attention, r=1) on a
token-pattern corpus where each token emits ONE frame of a token-specific
spectral pattern — the previous frame never predicts the next one, so
attending to the right encoder position is the ONLY way to reduce the loss.
A working LSA learns a clearly-diagonal alignment within ~800 steps; a broken
attention stays at the uniform-attention floor (~0.41 for these lengths).

Calibration (CPU, this environment): with the round-3 validated defaults
(guided attention 0.3 now on in every preset) the gate trains to
diagonality 0.99+ by step 800; untrained is 0.30-0.45. Gate: trained >
0.85 AND trained - untrained > 0.3 — tight enough to catch a DEGRADED
attention, not just a dead one (VERDICT r2 weak item; the old prior-less
calibration was 0.58-0.70 with a 0.01 margin at threshold 0.50).
"""

import json
import os

import jax
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides, get_preset
from gst_tacotron_tpu.data.pattern import Utterance, write_pattern
from gst_tacotron_tpu.models import alignment_diagonality
from gst_tacotron_tpu.text import NUM_SYMBOLS
from gst_tacotron_tpu.train import Trainer

GATE_STEPS = 800
GATE_THRESHOLD = 0.85


def gate_config():
    ov = {
        "audio.n_fft": 512, "audio.hop_length": 128, "audio.win_length": 512,
        "audio.num_mels": 16,
        "model.num_mels": 16, "model.num_freq": 33,
        "model.encoder.embedding_dim": 64,
        "model.encoder.prenet_dims": [64, 32],
        "model.encoder.prenet_dropout": 0.0,
        "model.encoder.cbhg_bank_k": 4,
        "model.encoder.cbhg_bank_channels": 32,
        "model.encoder.cbhg_proj_channels": [32, 32],
        "model.encoder.cbhg_highway_layers": 2,
        "model.encoder.cbhg_highway_dim": 32,
        "model.encoder.cbhg_gru_dim": 32,
        # GST off: the style path is not under test and its target-mel
        # conditioning is a content shortcut on a corpus this small
        "model.gst.enabled": False,
        "model.attention.dim": 32,
        "model.attention.location_filters": 8,
        "model.attention.location_kernel_size": 15,
        "model.decoder.prenet_dims": [64, 32],
        "model.decoder.prenet_dropout": 0.0,
        "model.decoder.attention_rnn_dim": 32,
        "model.decoder.decoder_rnn_dim": 32,
        "model.postnet.cbhg_bank_k": 2,
        "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [16, 16],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 16,
        "model.postnet.cbhg_gru_dim": 16,
        "data.batch_size": 8, "data.buckets": [[32, 64]],
        "optimizer.learning_rate": 1e-3, "optimizer.warmup_steps": 200,
        "loss.stop_masked": True, "loss.linear_weight": 0.0,
        "train.log_every": 100000, "train.checkpoint_every": 10 ** 7,
        "train.eval_every": 10 ** 8,
    }
    cfg = apply_overrides(get_preset("gst_r1_location"), ov)
    assert cfg.model.decoder.reduction_factor == 1
    assert cfg.model.attention.kind == "location_sensitive"
    return cfg


def write_token_pattern_corpus(cfg, out_dir, n=32, seed=0):
    """One frame per token; mel content is a fixed random per-token pattern."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    emb = rng.uniform(0.1, 0.9, (NUM_SYMBOLS, cfg.model.num_mels)).astype(
        np.float32)
    entries = []
    for i in range(n):
        n_tok = int(rng.integers(10, 25))
        toks = rng.integers(2, NUM_SYMBOLS, n_tok).astype(np.int32)
        mel = emb[toks]
        mel = np.clip(mel + 0.02 * rng.standard_normal(mel.shape), 0, 1
                      ).astype(np.float32)
        lin = np.zeros((mel.shape[0], cfg.model.num_freq), np.float32)
        u = Utterance(f"tp_{i:03d}", "x", None, "S0", 0)
        entries.append(write_pattern(u, toks, np.zeros(512, np.float32),
                                     mel, lin, out_dir, False))
    meta = {
        "audio": {"sample_rate": cfg.audio.sample_rate,
                  "n_fft": cfg.audio.n_fft,
                  "hop_length": cfg.audio.hop_length,
                  "num_mels": cfg.model.num_mels},
        "num_speakers": 1, "speakers": ["S0"], "entries": entries,
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)


def _teacher_forced_diag(trainer, batch):
    out = trainer.model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        batch["tokens"], batch["token_lengths"], batch["mel"], train=False,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    diag = alignment_diagonality(
        out["alignments"], batch["token_lengths"],
        np.maximum(1, batch["mel_lengths"]
                   // trainer.cfg.model.decoder.reduction_factor),
    )
    return float(np.mean(diag))


def test_config3_alignment_diagonality_gate(tmp_path):
    cfg = gate_config()
    patterns = str(tmp_path / "patterns")
    write_token_pattern_corpus(cfg, patterns)

    trainer = Trainer(cfg, patterns, str(tmp_path / "work"))
    it = iter(trainer.loader)
    probe = trainer._device_batch(next(it))
    untrained = _teacher_forced_diag(trainer, probe)

    for _ in range(GATE_STEPS):
        trainer.state, metrics = trainer.step_fn(
            trainer.state, trainer._device_batch(next(it)))
    assert np.isfinite(float(metrics["loss"]))

    trained = _teacher_forced_diag(trainer, probe)
    print(f"diagonality: untrained={untrained:.3f} trained={trained:.3f}")
    assert trained > GATE_THRESHOLD, (
        f"attention diagonality regressed: {trained:.3f} <= {GATE_THRESHOLD} "
        f"after {GATE_STEPS} steps (untrained {untrained:.3f})"
    )
    assert trained - untrained > 0.3, "training did not improve alignment"
