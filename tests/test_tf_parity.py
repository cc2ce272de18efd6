"""REAL TF/Keras numerical parity (VERDICT r1 top item; SURVEY.md §7 hard
part 2, §5 "one-way importer ... for the allclose-parity tests").

These tests build actual `tf.keras` layers (TF 2.21 is in the image for
exactly this), run their forward pass, save a REAL `tf.train.Checkpoint`,
re-load it through `tf_import.load_tf_checkpoint_arrays` + the conversion
helpers, and assert allclose against our flax modules. Any drift in GRU gate
order / reset_after semantics, conv SAME padding, or BatchNorm epsilon now
fails CI instead of passing by construction (the old hand-written "Keras
reference computation" in test_tf_import.py proved nothing about TF).

Reference-lineage component identities per SURVEY.md §2.1: CBHG BiGRU /
reference-encoder GRU / decoder GRUs are Keras GRU(reset_after=True); the
GST reference encoder is 6x Conv2D(3x3, stride 2, SAME) + BatchNormalization
+ ReLU + GRU.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gst_tacotron_tpu.config import GSTConfig  # noqa: E402
from gst_tacotron_tpu.models.gst import ReferenceEncoder  # noqa: E402
from gst_tacotron_tpu.models.modules import (  # noqa: E402
    BN_EPS,
    MatmulConv1D,
    MatmulConv2DStride2,
)
from gst_tacotron_tpu.models.rnn import GRU, GRUCell  # noqa: E402
from gst_tacotron_tpu.tf_import import (  # noqa: E402
    import_checkpoint,
    import_reference_encoder,
    keras_bn_params,
    keras_gru_params,
    load_tf_checkpoint_arrays,
)

RNG = np.random.default_rng(42)


def _save(tmp_path, **trackables) -> str:
    ckpt = tf.train.Checkpoint(**trackables)
    return ckpt.save(str(tmp_path / "ck"))


# ---------------------------------------------------------------------------
# GRU: gate order [z, r, n], reset_after=True, bias split
# ---------------------------------------------------------------------------


def test_keras_gru_checkpoint_roundtrip_cell(tmp_path):
    d, h, b = 3, 5, 4
    layer = tf.keras.layers.GRU(h, reset_after=True)
    x = RNG.standard_normal((b, 1, d)).astype(np.float32)
    h0 = RNG.standard_normal((b, h)).astype(np.float32)
    expected = layer(x, initial_state=tf.constant(h0)).numpy()

    path = _save(tmp_path, gru=layer)
    params = keras_gru_params(load_tf_checkpoint_arrays(path), "gru")

    ours, _ = GRUCell(h).apply(
        {"params": params}, jnp.asarray(h0), jnp.asarray(x[:, 0])
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_keras_gru_sequence_parity(tmp_path):
    d, h, b, t = 4, 6, 3, 9
    layer = tf.keras.layers.GRU(h, reset_after=True, return_sequences=True,
                                return_state=True)
    x = RNG.standard_normal((b, t, d)).astype(np.float32)
    ys_tf, final_tf = layer(x)

    path = _save(tmp_path, gru=layer)
    params = keras_gru_params(load_tf_checkpoint_arrays(path), "gru")

    ys, final = GRU(h, allow_pallas=False).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ys), ys_tf.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), final_tf.numpy(), atol=1e-5)


def test_keras_gru_masked_final_state_parity(tmp_path):
    """Masked (padded) sequences: final state must be the state at each
    sequence's true last step in both implementations."""
    d, h, b, t = 3, 4, 3, 8
    lengths = np.array([5, 8, 2], np.int32)
    layer = tf.keras.layers.GRU(h, reset_after=True, return_state=True)
    x = RNG.standard_normal((b, t, d)).astype(np.float32)
    mask = tf.constant(np.arange(t)[None, :] < lengths[:, None])
    _, final_tf = layer(x, mask=mask)

    path = _save(tmp_path, gru=layer)
    params = keras_gru_params(load_tf_checkpoint_arrays(path), "gru")

    _, final = GRU(h, allow_pallas=False).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(final), final_tf.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Convolutions: TF "same" padding semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t,k", [(12, 3), (11, 5), (7, 31)])
def test_keras_conv1d_same_parity(tmp_path, t, k):
    c_in, c_out, b = 3, 4, 2
    layer = tf.keras.layers.Conv1D(c_out, k, padding="same", use_bias=True)
    x = RNG.standard_normal((b, t, c_in)).astype(np.float32)
    expected = layer(x).numpy()

    path = _save(tmp_path, conv=layer)
    params = import_checkpoint(path, {
        "conv/_kernel/.ATTRIBUTES/VARIABLE_VALUE": "kernel",
        "conv/bias/.ATTRIBUTES/VARIABLE_VALUE": "bias",
    })

    ours = MatmulConv1D(c_out, k, use_bias=True).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


@pytest.mark.parametrize("h,w", [(12, 16), (11, 15), (5, 6)])
def test_keras_conv2d_stride2_same_parity(tmp_path, h, w):
    """3x3 stride-2 SAME conv2d — the GST reference-encoder stack layer —
    including odd input dims where TF's asymmetric padding rule bites."""
    c_in, c_out, b = 2, 3, 2
    layer = tf.keras.layers.Conv2D(c_out, 3, strides=2, padding="same",
                                   use_bias=False)
    x = RNG.standard_normal((b, h, w, c_in)).astype(np.float32)
    expected = layer(x).numpy()

    path = _save(tmp_path, conv=layer)
    params = import_checkpoint(path, {
        "conv/_kernel/.ATTRIBUTES/VARIABLE_VALUE": "kernel",
    })

    ours = MatmulConv2DStride2(c_out).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# BatchNorm: inference statistics + epsilon convention
# ---------------------------------------------------------------------------


def test_keras_batchnorm_inference_parity(tmp_path):
    import flax.linen as nn

    c, b = 5, 4
    layer = tf.keras.layers.BatchNormalization()  # Keras default eps 1e-3
    layer.build((None, c))
    # non-trivial moving statistics and affine params
    layer.gamma.assign(RNG.uniform(0.5, 2.0, c).astype(np.float32))
    layer.beta.assign(RNG.standard_normal(c).astype(np.float32))
    layer.moving_mean.assign(RNG.standard_normal(c).astype(np.float32))
    layer.moving_variance.assign(RNG.uniform(0.1, 3.0, c).astype(np.float32))

    x = RNG.standard_normal((b, c)).astype(np.float32)
    expected = layer(x, training=False).numpy()

    path = _save(tmp_path, bn=layer)
    params, stats = keras_bn_params(load_tf_checkpoint_arrays(path), "bn")

    ours = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# Composed: the GST reference encoder end-to-end through the importer
# ---------------------------------------------------------------------------


def _keras_reference_encoder(channels, gru_dim):
    """The reference encoder as actual Keras layers (SURVEY.md §2.1)."""
    convs = [tf.keras.layers.Conv2D(ch, 3, strides=2, padding="same",
                                    use_bias=False) for ch in channels]
    bns = [tf.keras.layers.BatchNormalization() for _ in channels]
    gru = tf.keras.layers.GRU(gru_dim, reset_after=True)

    def forward(mel):  # (B, T, F)
        x = tf.constant(mel)[..., None]
        for conv, bn in zip(convs, bns):
            x = tf.nn.relu(bn(conv(x), training=False))
        b = x.shape[0]
        t = x.shape[1]
        x = tf.reshape(x, (b, t, x.shape[2] * x.shape[3]))
        return gru(x).numpy()

    return convs, bns, gru, forward


def test_reference_encoder_checkpoint_import_end_to_end(tmp_path):
    channels = (4, 4, 8)
    gru_dim, num_mels, b, t = 6, 16, 2, 21
    convs, bns, gru, forward = _keras_reference_encoder(channels, gru_dim)

    mel = RNG.standard_normal((b, t, num_mels)).astype(np.float32)
    expected = forward(mel)  # also builds the layers
    # randomize BN statistics away from identity so they matter
    for bn in bns:
        bn.moving_mean.assign(
            RNG.standard_normal(bn.moving_mean.shape).astype(np.float32) * 0.3)
        bn.moving_variance.assign(
            RNG.uniform(0.5, 2.0, bn.moving_variance.shape).astype(np.float32))
    expected = forward(mel)

    trackables = {f"conv{i}": c for i, c in enumerate(convs)}
    trackables.update({f"bn{i}": bn for i, bn in enumerate(bns)})
    trackables["gru"] = gru
    path = _save(tmp_path, **trackables)

    variables = import_reference_encoder(path, len(channels))
    model = ReferenceEncoder(
        GSTConfig(ref_conv_channels=channels, ref_gru_dim=gru_dim), num_mels
    )
    ours = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(mel), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-4)
