"""WaveRNN vocoder tests: teacher-forced loss, sampling, causality."""

import jax
import jax.numpy as jnp
import numpy as np

from gst_tacotron_tpu.config import VocoderConfig
from gst_tacotron_tpu.models.wavernn import WaveRNN

CFG = VocoderConfig(kind="wavernn", wavernn_gru_dim=16, wavernn_fc_dim=16,
                    wavernn_bits=8, wavernn_hop=4)
NUM_MELS = 8


def make_model_and_data(t_frames=6, batch=2):
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((batch, t_frames, NUM_MELS)), jnp.float32)
    wav = jnp.asarray(
        rng.uniform(-0.9, 0.9, (batch, t_frames * CFG.wavernn_hop)), jnp.float32
    )
    model = WaveRNN(CFG, NUM_MELS)
    variables = model.init(jax.random.PRNGKey(0), mel, wav)
    return model, variables, mel, wav


def test_teacher_forced_logits_shape():
    model, variables, mel, wav = make_model_and_data()
    logits = model.apply(variables, mel, wav)
    assert logits.shape == (2, 24, 256)


def test_loss_finite_and_improves_direction():
    model, variables, mel, wav = make_model_and_data()
    loss = model.apply(variables, mel, wav, method=model.loss)
    assert np.isfinite(float(loss))
    # ~uniform predictions at init -> loss near log(256)
    assert abs(float(loss) - np.log(256)) < 1.0


def test_sampling_shapes_and_range():
    model, variables, mel, wav = make_model_and_data()
    out = model.apply(variables, mel, jax.random.PRNGKey(1),
                      method=model.sample)
    assert out.shape == wav.shape
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_causality():
    """Logits at sample t must not depend on wav samples >= t."""
    model, variables, mel, wav = make_model_and_data()
    logits1 = model.apply(variables, mel, wav)
    wav2 = wav.at[:, 12:].set(0.123)  # perturb the future
    logits2 = model.apply(variables, mel, wav2)
    # positions <= 12 unchanged (logits[t] sees prev samples < t)
    np.testing.assert_allclose(
        np.asarray(logits1[:, :13]), np.asarray(logits2[:, :13]), atol=1e-6
    )
    assert not np.allclose(np.asarray(logits1[:, 13:]),
                           np.asarray(logits2[:, 13:]))


def test_sampling_deterministic_given_key():
    model, variables, mel, wav = make_model_and_data()
    o1 = model.apply(variables, mel, jax.random.PRNGKey(7), method=model.sample)
    o2 = model.apply(variables, mel, jax.random.PRNGKey(7), method=model.sample)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
