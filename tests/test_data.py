"""Data pipeline tests: pattern generation + bucketed loader (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from gst_tacotron_tpu.config import AudioConfig, DataConfig
from gst_tacotron_tpu.data import (
    BucketedLoader,
    PatternDataset,
    generate_patterns,
    synthetic_utterances,
)

FAST_AUDIO = AudioConfig(n_fft=512, hop_length=128, win_length=512)


@pytest.fixture(scope="module")
def pattern_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("patterns"))
    utts = synthetic_utterances(12, num_speakers=2)
    meta = generate_patterns(utts, FAST_AUDIO, out)
    assert len(meta["entries"]) == 12
    return out


def test_pattern_contents(pattern_dir):
    ds = PatternDataset(pattern_dir)
    assert len(ds) == 12
    assert ds.num_speakers == 2
    item = ds.load(0)
    assert item["tokens"].dtype == np.int32
    assert item["mel"].shape[1] == FAST_AUDIO.num_mels
    assert item["linear"].shape[1] == FAST_AUDIO.num_freq
    assert item["mel"].shape[0] == item["linear"].shape[0]
    # normalized features within range
    assert item["mel"].min() >= 0.0 and item["mel"].max() <= 1.0
    entry = ds.entries[0]
    assert entry["mel_len"] == item["mel"].shape[0]
    assert entry["text_len"] == len(item["tokens"])


def test_loader_fixed_shapes(pattern_dir):
    cfg = DataConfig(batch_size=4, buckets=((64, 400), (128, 800), (256, 1600)))
    loader = BucketedLoader(PatternDataset(pattern_dir), cfg, reduction_factor=2)
    batches = list(loader.epoch(0))
    assert batches, "no batches produced"
    for b in batches:
        assert b["tokens"].shape[0] == 4
        assert b["mel"].shape[1] % 2 == 0  # r-aligned bucket
        assert b["mel"].shape[:2] == b["linear"].shape[:2]
        assert np.all(b["mel_lengths"] % 2 == 0)
        assert np.all(b["mel_lengths"] <= b["mel"].shape[1])
        assert np.all(b["token_lengths"] > 0)
        # shapes come from the bucket table, not the data
        assert (b["tokens"].shape[1], ) in {(64,), (128,), (256,)}


def test_loader_deterministic_and_sharded(pattern_dir):
    cfg = DataConfig(batch_size=2, buckets=((256, 1600),))
    ds = PatternDataset(pattern_dir)
    l1 = BucketedLoader(ds, cfg, 2, seed=7)
    l2 = BucketedLoader(ds, cfg, 2, seed=7)
    b1 = next(iter(l1.epoch(0)))
    b2 = next(iter(l2.epoch(0)))
    np.testing.assert_array_equal(b1["tokens"], b2["tokens"])

    # two shards see disjoint utterances in an epoch
    s0 = BucketedLoader(ds, cfg, 2, seed=7, shard_index=0, num_shards=2)
    s1 = BucketedLoader(ds, cfg, 2, seed=7, shard_index=1, num_shards=2)

    def utt_set(loader):
        out = set()
        for batch, spec in loader._epoch_batches(0):
            out.update(batch)
        return out

    assert utt_set(s0).isdisjoint(utt_set(s1))


def test_loader_global_stream_shard_invariant(pattern_dir):
    """batch_size is the GLOBAL batch: the concatenation of every host's
    contiguous slice reproduces the single-host batch stream exactly, for any
    shard count. This is the invariant the real 2-process jax.distributed
    run's loss-parity assert rests on (tools/multiproc_train.py), and it also
    guarantees every host's plan has the same length (no multi-host step
    desync on odd bucket counts)."""
    cfg = DataConfig(batch_size=4, buckets=((64, 400), (256, 1600)))
    ds = PatternDataset(pattern_dir)
    single = BucketedLoader(ds, cfg, 2, seed=11)
    shards = [BucketedLoader(ds, cfg, 2, seed=11, shard_index=r, num_shards=2)
              for r in range(2)]
    plan_s = single._epoch_batches(0)
    plans = [s._epoch_batches(0) for s in shards]
    assert len(plan_s) == len(plans[0]) == len(plans[1])
    for k in range(len(plan_s)):
        chunk, spec = plan_s[k]
        merged = plans[0][k][0] + plans[1][k][0]
        assert merged == chunk
        assert plans[0][k][1] == spec == plans[1][k][1]


def test_loader_resume_stream(pattern_dir):
    """stream(start_batch=k) continues exactly where batch k of the
    deterministic stream falls — checkpoint resume must not replay epoch 0
    (ADVICE r1 / VERDICT #10)."""
    cfg = DataConfig(batch_size=2, buckets=((256, 1600),), prefetch=2)
    loader = BucketedLoader(PatternDataset(pattern_dir), cfg, 2, seed=3)
    bpe = loader.batches_per_epoch()
    assert bpe > 1
    k = bpe + 1  # resume point inside epoch 1
    full = iter(loader)
    expected = None
    for _ in range(k + 1):
        expected = next(full)
    resumed = next(loader.stream(start_batch=k))
    np.testing.assert_array_equal(resumed["tokens"], expected["tokens"])
    np.testing.assert_array_equal(resumed["mel_lengths"], expected["mel_lengths"])


def test_loader_counts_dropped_entries(pattern_dir):
    # one tiny bucket: most utterances overflow and must be counted
    cfg = DataConfig(batch_size=1, buckets=((8, 16),), min_text_len=2)
    loader = BucketedLoader(PatternDataset(pattern_dir), cfg, 2)
    kept = sum(len(m) for m in loader.bucket_members)
    assert kept + loader.dropped_overflow + loader.dropped_short == 12
    assert loader.dropped_overflow > 0


def test_loader_prefetch_stream(pattern_dir):
    cfg = DataConfig(batch_size=2, buckets=((256, 1600),), prefetch=2)
    loader = BucketedLoader(PatternDataset(pattern_dir), cfg, 2)
    it = iter(loader)
    seen = [next(it) for _ in range(8)]  # crosses an epoch boundary
    assert all(s["tokens"].shape[0] == 2 for s in seen)


def _tone(sr, seconds=1.2, f0=220.0):
    import numpy as np
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_ljspeech_walker_and_patterns(tmp_path):
    """Real-corpus ingestion path: LJSpeech layout (metadata.csv + wavs/)
    walks, extracts, and indexes — incl. resampling from a foreign rate."""
    import numpy as np
    from scipy.io import wavfile
    from gst_tacotron_tpu.data.pattern import (
        generate_patterns, walk_ljspeech,
    )
    from gst_tacotron_tpu.data.loader import PatternDataset

    root = tmp_path / "lj"
    (root / "wavs").mkdir(parents=True)
    sr_foreign = 16000  # exercise the polyphase resample
    rows = []
    for i in range(3):
        uid = f"LJ001-{i:04d}"
        wavfile.write(str(root / "wavs" / (uid + ".wav")), sr_foreign,
                      (_tone(sr_foreign, f0=200 + 40 * i) * 32767
                       ).astype(np.int16))
        rows.append(f"{uid}|raw text {i}|normalized text {i}.")
    (root / "metadata.csv").write_text("\n".join(rows), encoding="utf-8")

    utts = walk_ljspeech(str(root))
    assert len(utts) == 3
    assert utts[0].text == "normalized text 0."  # prefers normalized column
    assert utts[0].speaker_id == 0

    out = tmp_path / "patterns"
    generate_patterns(utts, FAST_AUDIO, str(out), num_workers=1)
    ds = PatternDataset(str(out))
    assert len(ds) == 3
    item = ds.load(0)
    assert item["mel"].shape[1] == FAST_AUDIO.num_mels
    assert item["mel"].shape[0] > 10  # ~1.2 s of frames survived trimming


def test_vctk_walker_multispeaker(tmp_path):
    """VCTK layout (txt/<spk>/*.txt + wav48/<spk>/*.wav): per-speaker ids
    assigned in sorted order; utterances without wavs are skipped."""
    import numpy as np
    from scipy.io import wavfile
    from gst_tacotron_tpu.data.pattern import generate_patterns, walk_vctk
    from gst_tacotron_tpu.data.loader import PatternDataset

    root = tmp_path / "vctk"
    sr = FAST_AUDIO.sample_rate
    for spk in ("p225", "p226"):
        (root / "txt" / spk).mkdir(parents=True)
        (root / "wav48" / spk).mkdir(parents=True)
        for j in range(2):
            uid = f"{spk}_{j:03d}"
            (root / "txt" / spk / (uid + ".txt")).write_text(
                f"sentence {j} for {spk}.")
            wavfile.write(str(root / "wav48" / spk / (uid + ".wav")), sr,
                          (_tone(sr) * 32767).astype(np.int16))
    # one orphan transcript with no wav: must be skipped, not crash
    (root / "txt" / "p225" / "p225_999.txt").write_text("orphan.")

    utts = walk_vctk(str(root))
    assert len(utts) == 4
    assert {u.speaker for u in utts} == {"p225", "p226"}
    assert {u.speaker_id for u in utts} == {0, 1}

    out = tmp_path / "patterns"
    generate_patterns(utts, FAST_AUDIO, str(out), num_workers=1)
    ds = PatternDataset(str(out))
    assert ds.num_speakers == 2
    assert {e["speaker_id"] for e in ds.entries} == {0, 1}

def test_wav_only_patterns_and_variable_lengths(tmp_path):
    """--wav-only shards: no offline features on disk, mel_len from the
    frame-count formula (must equal the oracle's), wav stored f16; the
    feature-mode loader must reject them with a clear error; the variable
    synthetic corpus occupies multiple buckets (VERDICT r3 item 3)."""
    from gst_tacotron_tpu.dsp import ref as dsp_ref

    out = str(tmp_path / "wavonly")
    utts = synthetic_utterances(24, num_speakers=1, variable=True)
    # variable mode: unique texts, genuinely varied lengths
    texts = {u.text for u in utts}
    assert len(texts) == 24
    lens = sorted(len(u.text) for u in utts)
    assert lens[0] < 40 and lens[-1] > 120

    meta = generate_patterns(utts, FAST_AUDIO, out, wav_only=True)
    assert all(e["wav_only"] and e["has_wav"] for e in meta["entries"])
    # full audio config recorded (wav-only consumers rebuild mel from it)
    assert meta["audio"]["win_length"] == FAST_AUDIO.win_length

    ds = PatternDataset(out)
    item = ds.load(0, wav_only=True)
    assert item["wav"].dtype == np.float16
    assert "mel" not in ds.load(0)
    # metadata mel_len (1 + len//hop) == the oracle's frame count
    mel = dsp_ref.melspectrogram(
        np.asarray(item["wav"], np.float64), FAST_AUDIO)
    assert meta["entries"][0]["mel_len"] == mel.shape[0]

    # feature-mode loader rejects wav-only shards up front
    cfg_feat = DataConfig(batch_size=2, buckets=((64, 400), (256, 1600)))
    with pytest.raises(ValueError, match="wav-only"):
        BucketedLoader(ds, cfg_feat, 2)

    # wav-transport loader assembles wire batches from them
    cfg_wav = DataConfig(batch_size=2, buckets=((64, 400), (256, 1600)),
                         wav_transport=True)
    loader = BucketedLoader(ds, cfg_wav, 2, audio_cfg=FAST_AUDIO)
    occupied = [len(m) for m in loader.bucket_members]
    assert all(n > 0 for n in occupied), occupied  # multiple buckets hit
    batch = next(iter(loader.epoch(0)))
    assert batch["wav"].dtype == np.float16
    assert np.isfinite(batch["wav"].astype(np.float32)).all()


def test_vocoder_loader_wav_only(tmp_path):
    """VocoderSegmentLoader computes mel on demand from wav-only shards."""
    from gst_tacotron_tpu.vocoder_train import VocoderSegmentLoader

    out = str(tmp_path / "wavonly_voc")
    generate_patterns(synthetic_utterances(4), FAST_AUDIO, out, wav_only=True)
    loader = VocoderSegmentLoader(PatternDataset(out), FAST_AUDIO.hop_length,
                                  segment_frames=8, batch_size=2)
    batch = next(iter(loader))
    assert batch["mel"].shape == (2, 8, FAST_AUDIO.num_mels)
    assert batch["wav"].shape == (2, 8 * FAST_AUDIO.hop_length)
    assert np.isfinite(batch["mel"].astype(np.float32)).all()


def test_synthetic_nonlinear_durations():
    """VERDICT r4 #8: the nonlinear-durations corpus must (a) be
    deterministic, (b) produce genuinely non-constant token->time slopes."""
    import numpy as np

    from gst_tacotron_tpu.config import get_preset
    from gst_tacotron_tpu.data.pattern import (
        synthesize_wav, synthetic_utterances,
    )

    cfg = get_preset("taco1_lj").audio
    lin = synthetic_utterances(2, variable=True)
    non = synthetic_utterances(2, variable=True, nonlinear_durations=True)
    for a, b in zip(lin, non):
        wa, wb = synthesize_wav(a, cfg), synthesize_wav(b, cfg)
        assert not np.array_equal(wa, wb)
        # deterministic across calls
        assert np.array_equal(wb, synthesize_wav(b, cfg))
    # per-token durations vary: two same-text utterances with the flag give
    # different lengths than the fixed-0.08s mapping predicts
    tok_est = len(non[0].text) + 1
    fixed_len = tok_est * int(0.08 * cfg.sample_rate)
    got = len(synthesize_wav(non[0], cfg))
    assert abs(got - fixed_len) > 0.02 * fixed_len
