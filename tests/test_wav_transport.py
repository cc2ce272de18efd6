"""Wav-transport training (BASELINE north star "host loader feeding on-TPU
feature extraction"): the loader ships int16 preemphasized wav plus ONE
packed int32 sidecar per batch, and the jitted train step extracts
mel/linear on device (`train._materialize_features`). The wire format exists
because host->device bandwidth — not compute — bounds the train loop on the
TPU runtime (measured ~42 MB/s tunnel; a feature batch is ~8.5x the bytes of
its wav batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides, get_preset
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.data.loader import BucketedLoader, PatternDataset
from gst_tacotron_tpu.train import Trainer, _materialize_features

SMALL = {
    "audio.n_fft": 512,
    "audio.hop_length": 128,
    "audio.win_length": 512,
    "audio.griffin_lim_iters": 2,
    "model.num_freq": 257,
    "model.encoder.embedding_dim": 32,
    "model.encoder.prenet_dims": [32, 16],
    "model.encoder.cbhg_bank_k": 2,
    "model.encoder.cbhg_bank_channels": 16,
    "model.encoder.cbhg_proj_channels": [16, 16],
    "model.encoder.cbhg_highway_layers": 1,
    "model.encoder.cbhg_highway_dim": 16,
    "model.encoder.cbhg_gru_dim": 16,
    "model.gst.ref_conv_channels": [4, 8],
    "model.gst.ref_gru_dim": 16,
    "model.gst.style_dim": 16,
    "model.attention.dim": 16,
    "model.decoder.prenet_dims": [32, 16],
    "model.decoder.attention_rnn_dim": 16,
    "model.decoder.decoder_rnn_dim": 16,
    "model.decoder.max_decode_steps": 6,
    "model.postnet.cbhg_bank_k": 2,
    "model.postnet.cbhg_bank_channels": 8,
    "model.postnet.cbhg_proj_channels": [16, 80],
    "model.postnet.cbhg_highway_layers": 1,
    "model.postnet.cbhg_highway_dim": 16,
    "model.postnet.cbhg_gru_dim": 16,
    "data.batch_size": 2,
    "data.buckets": [[128, 1024]],
    "train.log_every": 2,
    "train.checkpoint_every": 1000,
    "train.eval_every": 1000,
}


def small_cfg(preset="taco1_lj", wav_transport=False, **extra):
    ov = dict(SMALL)
    ov["data.wav_transport"] = wav_transport
    ov.update(extra)
    return apply_overrides(get_preset(preset), ov)


@pytest.fixture(scope="module")
def pattern_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("patterns_wav"))
    cfg = small_cfg()
    generate_patterns(synthetic_utterances(6), cfg.audio, out, store_wav=True)
    return out


@pytest.fixture(scope="module")
def nowav_pattern_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("patterns_nowav"))
    cfg = small_cfg()
    generate_patterns(synthetic_utterances(3), cfg.audio, out)
    return out


def _loaders(pattern_dir, cfg_feat, cfg_wav):
    ds = PatternDataset(pattern_dir)
    feat = BucketedLoader(ds, cfg_feat.data, 2, seed=5,
                          audio_cfg=cfg_feat.audio)
    wav = BucketedLoader(ds, cfg_wav.data, 2, seed=5,
                         audio_cfg=cfg_wav.audio)
    return feat, wav


def test_wav_batch_layout(pattern_dir):
    cfg_feat = small_cfg()
    cfg_wav = small_cfg(wav_transport=True)
    feat, wav = _loaders(pattern_dir, cfg_feat, cfg_wav)
    fb = next(iter(feat.epoch(0)))
    wb = next(iter(wav.epoch(0)))
    assert set(wb) == {"wav", "ints"}
    assert wb["wav"].dtype == np.float16
    assert wb["ints"].dtype == np.int32
    b, tmax4 = wb["ints"].shape
    tmax = tmax4 - 4
    a = cfg_wav.audio
    frames = 1 + (wb["wav"].shape[1] - a.n_fft) // a.hop_length
    assert frames == feat.buckets[0].max_frames
    # sidecar fields agree with the feature-mode batch
    np.testing.assert_array_equal(wb["ints"][:, :tmax], fb["tokens"])
    np.testing.assert_array_equal(wb["ints"][:, tmax], fb["token_lengths"])
    np.testing.assert_array_equal(wb["ints"][:, tmax + 1], fb["mel_lengths"])
    np.testing.assert_array_equal(wb["ints"][:, tmax + 3], fb["speaker_ids"])
    # true frame counts are r-un-aligned lengths <= mel_lengths
    assert np.all(wb["ints"][:, tmax + 2] <= fb["mel_lengths"])
    assert np.all(wb["ints"][:, tmax + 2] >= fb["mel_lengths"] - 2 + 1)


def test_on_device_features_match_offline(pattern_dir):
    """The train step's on-device extraction reproduces the offline feature
    batches to (float16-wire-limited) tolerance, frame for frame."""
    cfg_feat = small_cfg()
    cfg_wav = small_cfg(wav_transport=True)
    feat, wav = _loaders(pattern_dir, cfg_feat, cfg_wav)
    fb = next(iter(feat.epoch(0)))
    wb = next(iter(wav.epoch(0)))
    mat = _materialize_features(
        cfg_wav, {k: jnp.asarray(v) for k, v in wb.items()})
    assert set(mat) >= {"tokens", "token_lengths", "mel", "mel_lengths",
                        "linear", "speaker_ids"}
    np.testing.assert_array_equal(np.asarray(mat["tokens"]), fb["tokens"])
    mel_dev = np.asarray(mat["mel"], np.float32)
    lin_dev = np.asarray(mat["linear"], np.float32)
    t = fb["mel"].shape[1]
    assert mel_dev.shape[1] >= t
    # max-err note: isolated near-cancellation linear bins (true magnitude
    # ~1e-3 from destructive interference across the frame) see the f16 wire
    # noise amplified by the dB mapping — up to ~0.07 normalized on single
    # bins, pure dither with no L1-loss effect (see the 5%-loss-parity bound
    # in test_train_smoke_wav_transport).
    for name, mxtol, dev, ref in (
            ("mel", 2e-2, mel_dev[:, :t], fb["mel"]),
            ("linear", 1e-1, lin_dev[:, :t], fb["linear"])):
        mae = float(np.abs(dev - ref).mean())
        mx = float(np.abs(dev - ref).max())
        assert mae < 1e-3, f"{name} MAE {mae}"
        assert mx < mxtol, f"{name} max err {mx}"
    # frames past the true length are exactly zero (matches offline padding,
    # keeps GST reference-encoder BatchNorm consistent between transports)
    frames_true = np.asarray(wb["ints"][:, -2])
    for j in range(mel_dev.shape[0]):
        assert np.all(mel_dev[j, frames_true[j]:] == 0.0)
        assert np.all(lin_dev[j, frames_true[j]:] == 0.0)


def test_wav_transport_requires_stored_wav(nowav_pattern_dir):
    cfg = small_cfg(wav_transport=True)
    with pytest.raises(ValueError, match="store-wav"):
        BucketedLoader(PatternDataset(nowav_pattern_dir), cfg.data, 2,
                       audio_cfg=cfg.audio)


def test_train_smoke_wav_transport(pattern_dir, tmp_path):
    """GST config end-to-end on the wav wire format: losses finite and close
    to the feature-transport losses on the same data/seed."""
    work = str(tmp_path / "w1")
    cfg_wav = small_cfg("gst_lj", wav_transport=True)
    tr = Trainer(cfg_wav, pattern_dir, work)
    it = iter(tr.loader)
    batch = tr._device_batch(next(it))
    tr.state, metrics = tr.step_fn(tr.state, batch)
    loss_wav = float(metrics["loss"])
    assert np.isfinite(loss_wav)

    cfg_feat = small_cfg("gst_lj")
    tr2 = Trainer(cfg_feat, pattern_dir, str(tmp_path / "w2"))
    b2 = tr2._device_batch(next(iter(tr2.loader)))
    tr2.state, m2 = tr2.step_fn(tr2.state, b2)
    loss_feat = float(m2["loss"])
    assert abs(loss_wav - loss_feat) / loss_feat < 0.05

    state = tr.train(total_steps=3)
    assert int(state.step) == 3


def test_device_corpus_bitwise_matches_wire(pattern_dir, tmp_path):
    """device_corpus mode must produce the SAME deterministic batch stream
    and the SAME training trajectory as the wav-wire path (the corpus rows
    are the wire rows, uploaded once and gathered by index)."""
    cfg_wire = small_cfg("gst_lj", wav_transport=True)
    cfg_corp = small_cfg("gst_lj", wav_transport=True,
                         **{"data.device_corpus": True})

    tr_w = Trainer(cfg_wire, pattern_dir, str(tmp_path / "w"))
    tr_c = Trainer(cfg_corp, pattern_dir, str(tmp_path / "c"))
    assert tr_c.corpus is not None

    # the per-bucket corpus rows ARE the wire rows (bit-identical)
    b_idx, rows, spec = next(tr_c.loader.stream_indices(0))
    wire_batch = next(iter(tr_w.loader.stream(0)))
    sig_len = (spec.max_frames - 1) * cfg_wire.audio.hop_length + cfg_wire.audio.n_fft
    c_wav, c_ints = tr_c.corpus[b_idx]
    assert c_wav.shape[1] == sig_len  # stored at the bucket's own shape
    np.testing.assert_array_equal(np.asarray(c_wav)[rows], wire_batch["wav"])
    np.testing.assert_array_equal(np.asarray(c_ints)[rows], wire_batch["ints"])

    # identical two-step training trajectory
    s_w = tr_w.train(total_steps=2)
    s_c = tr_c.train(total_steps=2)
    key = lambda kv: str(kv[0])
    for (kw, vw), (kc, vc) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(s_w.params)[0], key=key),
            sorted(jax.tree_util.tree_flatten_with_path(s_c.params)[0], key=key)):
        np.testing.assert_allclose(np.asarray(vw), np.asarray(vc),
                                   atol=1e-6, err_msg=str(kw))


def test_device_corpus_requires_wav_transport(pattern_dir, tmp_path):
    cfg = small_cfg("gst_lj", wav_transport=False,
                    **{"data.device_corpus": True})
    with pytest.raises(ValueError, match="wav_transport"):
        Trainer(cfg, pattern_dir, str(tmp_path / "x"))


def test_device_corpus_size_guard(pattern_dir, tmp_path):
    cfg = small_cfg("gst_lj", wav_transport=True,
                    **{"data.device_corpus": True,
                       "data.device_corpus_max_gb": 1e-9})
    with pytest.raises(ValueError, match="device_corpus_max_gb"):
        Trainer(cfg, pattern_dir, str(tmp_path / "y"))


def test_device_corpus_resume_matches_straight_run(pattern_dir, tmp_path):
    """Checkpoint-resume under device_corpus continues the deterministic
    index stream: train 2 + resume to 4 == straight run to 4."""
    cfg = small_cfg("gst_lj", wav_transport=True,
                    **{"data.device_corpus": True,
                       "train.checkpoint_every": 2})
    t1 = Trainer(cfg, pattern_dir, str(tmp_path / "a"))
    t1.train(total_steps=2)
    t2 = Trainer(cfg, pattern_dir, str(tmp_path / "a"))
    assert t2.restore_if_available() and int(t2.state.step) == 2
    s_resumed = t2.train(total_steps=4)

    t3 = Trainer(cfg, pattern_dir, str(tmp_path / "b"))
    s_straight = t3.train(total_steps=4)

    key = lambda kv: str(kv[0])
    import jax
    for (kw, vw), (kc, vc) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(s_resumed.params)[0], key=key),
            sorted(jax.tree_util.tree_flatten_with_path(s_straight.params)[0], key=key)):
        np.testing.assert_allclose(np.asarray(vw), np.asarray(vc),
                                   atol=1e-6, err_msg=str(kw))
