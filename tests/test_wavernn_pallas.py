"""WaveRNN Pallas sampling kernel vs the scan sampler (greedy mode —
deterministic, so the comparison is exact class-for-class)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import VocoderConfig
from gst_tacotron_tpu.dsp.jax_dsp import mulaw_decode
from gst_tacotron_tpu.models.wavernn import WaveRNN
from gst_tacotron_tpu.ops.wavernn_pallas import (
    pack_wavernn_weights,
    wavernn_sample_pallas,
)

CFG = VocoderConfig(kind="wavernn", wavernn_gru_dim=16, wavernn_fc_dim=16,
                    wavernn_bits=8, wavernn_hop=4)
NUM_MELS = 8


def build(t_frames=5, batch=2):
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((batch, t_frames, NUM_MELS)), jnp.float32)
    model = WaveRNN(CFG, NUM_MELS)
    variables = model.init(jax.random.PRNGKey(0), mel,
                           jnp.zeros((batch, t_frames * CFG.wavernn_hop)))
    return model, variables, mel


def test_greedy_kernel_matches_scan():
    model, variables, mel = build()
    ref_wav = model.apply(variables, mel, jax.random.PRNGKey(0),
                          greedy=True, method=model.sample)

    cond = model.apply(variables, mel, method=model.upsample_cond)
    packed = pack_wavernn_weights(variables["params"], CFG)
    classes = wavernn_sample_pallas(
        {k: jnp.asarray(v) for k, v in packed.items()}, cond,
        cfg=CFG, greedy=True, interpret=True,
    )
    got_wav = mulaw_decode(classes, CFG.wavernn_bits)
    np.testing.assert_allclose(np.asarray(got_wav), np.asarray(ref_wav),
                               atol=1e-6)


def test_kernel_output_shape_and_range():
    model, variables, mel = build(t_frames=3, batch=3)
    cond = model.apply(variables, mel, method=model.upsample_cond)
    packed = pack_wavernn_weights(variables["params"], CFG)
    classes = wavernn_sample_pallas(
        {k: jnp.asarray(v) for k, v in packed.items()}, cond,
        cfg=CFG, greedy=True, interpret=True,
    )
    assert classes.shape == (3, 12)
    c = np.asarray(classes)
    assert c.min() >= 0 and c.max() < 256


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="stochastic mode needs the on-core PRNG (TPU only)",
)
def test_stochastic_kernel_runs():
    model, variables, mel = build()
    cond = model.apply(variables, mel, method=model.upsample_cond)
    packed = pack_wavernn_weights(variables["params"], CFG)
    c1 = wavernn_sample_pallas(
        {k: jnp.asarray(v) for k, v in packed.items()}, cond,
        cfg=CFG, seed=1, temperature=1.0,
    )
    c2 = wavernn_sample_pallas(
        {k: jnp.asarray(v) for k, v in packed.items()}, cond,
        cfg=CFG, seed=2, temperature=1.0,
    )
    assert not np.array_equal(np.asarray(c1), np.asarray(c2))
