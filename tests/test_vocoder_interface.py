"""Pluggable vocoder interface: Griffin-Lim and WaveRNN behind one API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides, get_preset
from gst_tacotron_tpu.models.wavernn import WaveRNN
from gst_tacotron_tpu.vocoder import (
    GriffinLimVocoder,
    WaveRNNVocoder,
    make_vocoder,
)


def small_cfg(kind):
    return apply_overrides(get_preset("gst_wavernn"), {
        "audio.n_fft": 512, "audio.hop_length": 128, "audio.win_length": 512,
        "audio.griffin_lim_iters": 2,
        "model.num_freq": 257,
        "model.vocoder.kind": kind,
        "model.vocoder.wavernn_gru_dim": 16,
        "model.vocoder.wavernn_fc_dim": 16,
        "model.vocoder.wavernn_hop": 128,
    })


def test_griffin_lim_vocoder():
    cfg = small_cfg("griffin_lim")
    voc = make_vocoder(cfg)
    assert isinstance(voc, GriffinLimVocoder)
    rng = np.random.default_rng(0)
    outputs = {"linear": jnp.asarray(rng.random((2, 12, 257)), jnp.float32)}
    wav = voc(outputs)
    assert wav.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(wav)))


def test_wavernn_vocoder_roundtrip():
    cfg = small_cfg("wavernn")
    model = WaveRNN(cfg.model.vocoder, cfg.model.num_mels)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((2, 6, cfg.model.num_mels)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel, jnp.zeros((2, 6 * 128)))
    voc = make_vocoder(cfg, wavernn_variables=variables)
    assert isinstance(voc, WaveRNNVocoder)
    wav = voc({"mel": mel}, rng=jax.random.PRNGKey(1))
    assert wav.shape == (2, 6 * 128)
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


def test_wavernn_vocoder_requires_variables():
    cfg = small_cfg("wavernn")
    with pytest.raises(ValueError, match="variables"):
        make_vocoder(cfg)


def test_unknown_kind():
    cfg = small_cfg("griffin_lim")
    cfg = apply_overrides(cfg, {"model.vocoder.kind": "nope"})
    with pytest.raises(ValueError, match="unknown"):
        make_vocoder(cfg)
