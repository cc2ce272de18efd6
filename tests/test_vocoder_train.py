"""Vocoder trainer smoke: segment loader shapes + a few training steps."""

import jax
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides, get_preset
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.data.loader import PatternDataset
from gst_tacotron_tpu.vocoder_train import VocoderSegmentLoader, VocoderTrainer


@pytest.fixture(scope="module")
def voc_cfg():
    return apply_overrides(get_preset("gst_wavernn"), {
        "audio.n_fft": 512, "audio.hop_length": 128, "audio.win_length": 512,
        "model.num_freq": 257,
        "model.vocoder.wavernn_gru_dim": 16,
        "model.vocoder.wavernn_fc_dim": 16,
        "model.vocoder.wavernn_hop": 128,
        "train.log_every": 2, "train.checkpoint_every": 100,
    })


@pytest.fixture(scope="module")
def voc_patterns(tmp_path_factory, voc_cfg):
    out = str(tmp_path_factory.mktemp("voc_patterns"))
    generate_patterns(synthetic_utterances(4), voc_cfg.audio, out, store_wav=True)
    return out


def test_segment_loader_shapes(voc_patterns, voc_cfg):
    ds = PatternDataset(voc_patterns)
    loader = VocoderSegmentLoader(ds, hop=128, segment_frames=8, batch_size=3)
    batch = next(iter(loader))
    assert batch["mel"].shape == (3, 8, voc_cfg.audio.num_mels)
    assert batch["wav"].shape == (3, 8 * 128)
    assert np.all(np.abs(batch["wav"]) <= 1.0)


def test_segment_loader_requires_wav(tmp_path, voc_cfg):
    out = str(tmp_path / "nowav")
    generate_patterns(synthetic_utterances(2), voc_cfg.audio, out, store_wav=False)
    ds = PatternDataset(out)
    with pytest.raises(ValueError, match="store-wav"):
        VocoderSegmentLoader(ds, hop=128, segment_frames=8, batch_size=2)


def test_vocoder_trainer_steps(voc_patterns, voc_cfg, tmp_path):
    trainer = VocoderTrainer(voc_cfg, voc_patterns, str(tmp_path / "w"),
                             segment_frames=8, batch_size=2)
    state = trainer.train(total_steps=3)
    assert int(state.step) == 3


def test_vocoder_trainer_resume(voc_patterns, voc_cfg, tmp_path):
    """restore_if_available continues from the saved step (ADVICE-round-1
    class of bug: vocoder_train previously had no resume path at all)."""
    cfg = apply_overrides(voc_cfg, {"train.checkpoint_every": 2})
    work = str(tmp_path / "w")
    t1 = VocoderTrainer(cfg, voc_patterns, work, segment_frames=8, batch_size=2)
    t1.train(total_steps=2)
    t2 = VocoderTrainer(cfg, voc_patterns, work, segment_frames=8, batch_size=2)
    assert t2.restore_if_available()
    assert int(t2.state.step) == 2
    state = t2.train(total_steps=4)
    assert int(state.step) == 4
