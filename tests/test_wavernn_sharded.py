"""Config-5 distribution: WaveRNN sampling sharded over the mesh
(BASELINE.json:11 "sharded over N>=2 hosts"): utterance batch over `data`,
GRU/FC kernels over `model` (GSPMD inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gst_tacotron_tpu.config import VocoderConfig
from gst_tacotron_tpu.models.wavernn import WaveRNN
from gst_tacotron_tpu.parallel import (
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake CPU devices"
)

CFG = VocoderConfig(wavernn_gru_dim=16, wavernn_fc_dim=16, wavernn_hop=4)
NUM_MELS = 8


def test_sharded_sampling_matches_single_device():
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((8, 6, NUM_MELS)), jnp.float32)
    model = WaveRNN(CFG, NUM_MELS)
    variables = model.init(jax.random.PRNGKey(0), mel,
                           jnp.zeros((8, 24)))

    # single-device reference
    ref = model.apply(variables, mel, jax.random.PRNGKey(3),
                      method=model.sample)

    mesh = make_mesh(model_parallelism=2)  # (4 data, 2 model)
    params = shard_params(variables["params"], mesh)
    # verify TP placement happened
    assert params["gru"]["kernel"].sharding.spec == P(None, MODEL_AXIS)

    mel_sharded = jax.device_put(mel, data_sharding(mesh))

    @jax.jit
    def sample(params, mel, rng):
        return model.apply({"params": params}, mel, rng, method=model.sample)

    out = sample(params, mel_sharded, jax.random.PRNGKey(3))
    assert out.shape == (8, 24)
    # identical PRNG stream -> identical samples regardless of sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_vocoder_training_step():
    from gst_tacotron_tpu.train import TrainState, make_optimizer
    from gst_tacotron_tpu.config import OptimizerConfig
    import optax

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((8, 6, NUM_MELS)), jnp.float32)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (8, 24)), jnp.float32)
    model = WaveRNN(CFG, NUM_MELS)
    variables = model.init(jax.random.PRNGKey(0), mel, wav)

    mesh = make_mesh(model_parallelism=1)
    params = shard_params(variables["params"], mesh)
    tx = make_optimizer(OptimizerConfig())

    @jax.jit
    def step(params, opt_state, mel, wav):
        def loss_fn(p):
            return model.apply({"params": p}, mel, wav, method=model.loss)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    sharding = data_sharding(mesh)
    mel_s = jax.device_put(mel, sharding)
    wav_s = jax.device_put(wav, sharding)
    params2, opt_state, loss = step(params, tx.init(params), mel_s, wav_s)
    assert np.isfinite(float(loss))
