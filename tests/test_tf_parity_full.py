"""FULL-MODEL TF/Keras end-to-end parity (VERDICT r2 #1; SURVEY.md §7 stage
10 / hard part 2; BASELINE "mel outputs allclose").

The complete reference architecture — embedding -> prenet -> CBHG encoder ->
GST (6-conv reference encoder + style token layer) -> attention decoder cell
-> post-CBHG -> linear — is built out of REAL `tf.keras` layers
(tests/keras_ref_model.py), every variable randomized, a real
`tf.train.Checkpoint` saved, imported through
`tf_import.import_gst_tacotron`, and the teacher-forced forward asserted
allclose END TO END (mel, linear, stop logits, alignments). ANY convention
drift in ANY module — GRU gate order/reset_after, conv SAME padding, BN
epsilon, highway/residual wiring, the fused conv-bank block matrix, STL
multi-head attention, the decoder step — fails here.

Covers both attention cells (Bahdanau and location-sensitive) and both CBHG
residual topologies (direct residual, and residual_proj + pre_highway).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from keras_ref_model import KerasGSTTacotron  # noqa: E402

from gst_tacotron_tpu.config import apply_overrides, get_preset  # noqa: E402
from gst_tacotron_tpu.models.tacotron import GSTTacotron  # noqa: E402
from gst_tacotron_tpu.tf_import import import_gst_tacotron  # noqa: E402

NUM_SYMBOLS = 20
NUM_MELS = 80
NUM_FREQ = 33


def tiny_cfg(attention_kind: str, with_residual_proj: bool):
    enc_proj_last = 12 if with_residual_proj else 8
    ov = {
        "model.num_freq": NUM_FREQ,
        "model.num_symbols": NUM_SYMBOLS,
        "model.encoder.embedding_dim": 16,
        "model.encoder.prenet_dims": [16, 8],
        "model.encoder.cbhg_bank_k": 4,
        "model.encoder.cbhg_bank_channels": 8,
        "model.encoder.cbhg_proj_channels": [8, enc_proj_last],
        "model.encoder.cbhg_highway_layers": 2,
        "model.encoder.cbhg_highway_dim": 8,
        "model.encoder.cbhg_gru_dim": 8,
        "model.gst.ref_conv_channels": [4, 8],
        "model.gst.ref_gru_dim": 8,
        "model.gst.style_dim": 8,
        "model.gst.num_tokens": 5,
        "model.gst.num_heads": 2,
        "model.attention.kind": attention_kind,
        "model.attention.dim": 8,
        "model.attention.location_filters": 4,
        "model.attention.location_kernel_size": 5,
        "model.decoder.prenet_dims": [16, 8],
        "model.decoder.attention_rnn_dim": 8,
        "model.decoder.decoder_rnn_dim": 8,
        "model.decoder.reduction_factor": 2,
        "model.postnet.cbhg_bank_k": 3,
        "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [8, NUM_MELS],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 8,
        "model.postnet.cbhg_gru_dim": 8,
    }
    return apply_overrides(get_preset("gst_lj"), ov)


def build_keras(cfg):
    m = cfg.model
    return KerasGSTTacotron(
        num_symbols=NUM_SYMBOLS,
        embedding_dim=m.encoder.embedding_dim,
        enc_prenet_dims=m.encoder.prenet_dims,
        enc_cbhg=dict(bank_k=m.encoder.cbhg_bank_k,
                      bank_channels=m.encoder.cbhg_bank_channels,
                      proj_channels=m.encoder.cbhg_proj_channels,
                      highway_layers=m.encoder.cbhg_highway_layers,
                      highway_dim=m.encoder.cbhg_highway_dim,
                      gru_dim=m.encoder.cbhg_gru_dim),
        num_mels=m.num_mels, num_freq=m.num_freq,
        gst_conv_channels=m.gst.ref_conv_channels,
        gst_gru_dim=m.gst.ref_gru_dim,
        gst_num_tokens=m.gst.num_tokens, gst_num_heads=m.gst.num_heads,
        gst_style_dim=m.gst.style_dim,
        attn_dim=m.attention.dim,
        dec_prenet_dims=m.decoder.prenet_dims,
        attention_rnn_dim=m.decoder.attention_rnn_dim,
        decoder_rnn_dim=m.decoder.decoder_rnn_dim,
        num_decoder_rnns=m.decoder.num_decoder_rnn_layers,
        reduction_factor=m.decoder.reduction_factor,
        post_cbhg=dict(bank_k=m.postnet.cbhg_bank_k,
                       bank_channels=m.postnet.cbhg_bank_channels,
                       proj_channels=m.postnet.cbhg_proj_channels,
                       highway_layers=m.postnet.cbhg_highway_layers,
                       highway_dim=m.postnet.cbhg_highway_dim,
                       gru_dim=m.postnet.cbhg_gru_dim),
        attention_kind=m.attention.kind,
        location_filters=m.attention.location_filters,
        location_kernel_size=m.attention.location_kernel_size,
        cumulative=m.attention.cumulative,
    )


@pytest.mark.parametrize(
    "attention_kind,with_residual_proj",
    [("bahdanau", False), ("location_sensitive", True)],
)
def test_full_model_teacher_forced_parity(tmp_path, attention_kind,
                                          with_residual_proj):
    rng = np.random.default_rng(3 if attention_kind == "bahdanau" else 4)
    cfg = tiny_cfg(attention_kind, with_residual_proj)
    b, t_text, t_mel, t_ref = 2, 13, 10, 9

    tokens = rng.integers(1, NUM_SYMBOLS, (b, t_text)).astype(np.int32)
    mel_targets = rng.normal(0, 1.0, (b, t_mel, NUM_MELS)).astype(np.float32)
    ref_mel = rng.normal(0, 1.0, (b, t_ref, NUM_MELS)).astype(np.float32)

    keras_model = build_keras(cfg)
    keras_model(tf.constant(tokens), tf.constant(mel_targets),
                tf.constant(ref_mel))  # build all variables
    keras_model.randomize(rng)
    expected = keras_model(tf.constant(tokens), tf.constant(mel_targets),
                           tf.constant(ref_mel))
    ckpt_path = keras_model.save_checkpoint(tmp_path / "ref_ck")

    variables = import_gst_tacotron(ckpt_path, cfg.model)
    model = GSTTacotron(cfg.model, num_symbols=NUM_SYMBOLS)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(tokens), None, jnp.asarray(mel_targets),
        ref_mel=jnp.asarray(ref_mel),
        train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )

    np.testing.assert_allclose(
        np.asarray(out["alignments"]), expected["alignments"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["stop_logits"]), expected["stop_logits"], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out["mel"]), expected["mel"], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out["linear"]), expected["linear"], atol=2e-4)


def test_full_model_parity_is_sensitive(tmp_path):
    """Negative control: perturbing ONE imported weight must break parity —
    guards against a vacuously-passing allclose (e.g. both sides zero)."""
    rng = np.random.default_rng(5)
    cfg = tiny_cfg("bahdanau", False)
    b, t_text, t_mel, t_ref = 2, 11, 8, 7
    tokens = rng.integers(1, NUM_SYMBOLS, (b, t_text)).astype(np.int32)
    mel_targets = rng.normal(0, 1.0, (b, t_mel, NUM_MELS)).astype(np.float32)
    ref_mel = rng.normal(0, 1.0, (b, t_ref, NUM_MELS)).astype(np.float32)

    keras_model = build_keras(cfg)
    keras_model(tf.constant(tokens), tf.constant(mel_targets),
                tf.constant(ref_mel))
    keras_model.randomize(rng)
    expected = keras_model(tf.constant(tokens), tf.constant(mel_targets),
                           tf.constant(ref_mel))
    ckpt_path = keras_model.save_checkpoint(tmp_path / "ref_ck")

    variables = import_gst_tacotron(ckpt_path, cfg.model)
    # flip sign of one GRU recurrent kernel deep in the stack
    rk = variables["params"]["decoder"]["cell"]["attention_rnn"][
        "recurrent_kernel"]
    variables["params"]["decoder"]["cell"]["attention_rnn"][
        "recurrent_kernel"] = -rk

    model = GSTTacotron(cfg.model, num_symbols=NUM_SYMBOLS)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(tokens), None, jnp.asarray(mel_targets),
        ref_mel=jnp.asarray(ref_mel),
        train=False, deterministic_prenet=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    assert not np.allclose(np.asarray(out["mel"]), expected["mel"], atol=5e-5)
