"""Offline pattern generation (reference Pattern_Generator.py; SURVEY.md §3.1).

Walks a corpus, cleans/tokenizes transcripts, extracts mel + linear features
via the DSP layer, and writes one ``.npz`` pattern per utterance plus a JSON
metadata index with lengths (used for bucketing by the loader). Supported
corpora:

  * ``ljspeech`` — single speaker; `metadata.csv` + `wavs/*.wav` layout.
  * ``vctk`` — multi-speaker; `txt/<spk>/*.txt` + `wav48/<spk>/*.wav` layout
    (config 4, BASELINE.json:10).
  * ``synthetic`` — a deterministic procedurally-generated corpus (formant-ish
    harmonic stacks driven by the token sequence) so the full train/synth
    pipeline can run end-to-end in environments with no audio data, and so
    tests have a corpus fixture.

Wav IO uses scipy (no librosa/soundfile in this environment). Feature
extraction runs in worker processes (the reference loops serially;
SURVEY.md §3.1 "embarrassingly parallel").
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from typing import Iterable, List, Optional, Tuple

import numpy as np
from scipy.io import wavfile

from ..config import AudioConfig, Config, get_preset, load_config
from ..dsp import ref as dsp_ref
from ..text import text_to_ids

METADATA_FILE = "metadata.json"


@dataclass
class Utterance:
    utt_id: str
    text: str
    wav_path: Optional[str]  # None for synthetic
    speaker: str
    speaker_id: int
    # synthetic wavs only: random per-token durations + inserted pauses, so
    # the token->time map is NOT constant-slope and alignment diagonality
    # can fall below 1.0 (VERDICT r4 #8: the fixed-0.08s corpus saturated
    # eval/diagonality at 1.0, making the metric unable to fail)
    nonlinear_durations: bool = False


# ---------------------------------------------------------------------------
# Corpus walkers
# ---------------------------------------------------------------------------


def walk_ljspeech(root: str) -> List[Utterance]:
    utts = []
    meta = os.path.join(root, "metadata.csv")
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            utt_id = parts[0]
            text = parts[2] if len(parts) > 2 and parts[2] else parts[1]
            wav = os.path.join(root, "wavs", utt_id + ".wav")
            utts.append(Utterance(utt_id, text, wav, "LJ", 0))
    return utts


def walk_vctk(root: str) -> List[Utterance]:
    utts = []
    txt_root = os.path.join(root, "txt")
    speakers = sorted(os.listdir(txt_root)) if os.path.isdir(txt_root) else []
    for spk_idx, spk in enumerate(speakers):
        spk_dir = os.path.join(txt_root, spk)
        for fname in sorted(os.listdir(spk_dir)):
            if not fname.endswith(".txt"):
                continue
            utt_id = fname[:-4]
            with open(os.path.join(spk_dir, fname), encoding="utf-8") as f:
                text = f.read().strip()
            wav = None
            for wav_dir in ("wav48", "wav"):
                cand = os.path.join(root, wav_dir, spk, utt_id + ".wav")
                if os.path.exists(cand):
                    wav = cand
                    break
            if wav:
                utts.append(Utterance(utt_id, text, wav, spk, spk_idx))
    return utts


_SYNTH_SENTENCES = [
    "the quick brown fox jumps over the lazy dog.",
    "she sells sea shells by the sea shore.",
    "a stitch in time saves nine.",
    "all that glitters is not gold.",
    "actions speak louder than words.",
    "the early bird catches the worm.",
    "practice makes perfect every day.",
    "better late than never they say.",
    "every cloud has a silver lining.",
    "fortune favors the bold and the brave.",
    "honesty is the best policy in the end.",
    "knowledge is power and power is knowledge.",
    "look before you leap into the water.",
    "no news is good news for the waiting.",
    "the pen is mightier than the sword.",
    "when in rome do as the romans do.",
]


_SYNTH_WORDS = (
    "the a one this that every other through under over about after before "
    "against between without toward beyond quick slow bright dark heavy "
    "light early late young ancient quiet loud simple complex narrow wide "
    "golden silver frozen burning distant nearby hidden open broken whole "
    "fox dog river mountain valley forest harbor island meadow garden "
    "window doorway ladder bridge engine signal pattern stream thread "
    "crystal shadow thunder whisper journey morning evening winter summer "
    "autumn spring teacher sailor farmer painter doctor stranger neighbor "
    "children horses sparrows lanterns baskets letters stories numbers "
    "voices colors jumps runs walks sleeps dreams carries follows becomes "
    "remains appears vanishes gathers scatters remembers forgets discovers "
    "explains believes wonders listens answers questions travels returns "
    "arrives departs rises falls grows fades sings echoes drifts settles "
    "and but or while because although since when where how why if then "
    "slowly quickly quietly brightly together alone forever sometimes "
    "often rarely almost nearly quite very too also still again once"
).split()


def synthetic_utterances(n: int, num_speakers: int = 1,
                         variable: bool = False,
                         nonlinear_durations: bool = False) -> List[Utterance]:
    """Deterministic synthetic corpus. `variable=False` keeps the legacy
    16-sentence cycle (small smoke corpora, byte-stable with old fixtures).
    `variable=True` composes unique word sequences with genuinely varied
    lengths (~12-170 chars, near-uniform over that range) so a large corpus
    occupies every length bucket — the scale-realistic mode (VERDICT r3
    item 3: trained evidence must not be 16 memorized sentences).
    `nonlinear_durations=True` additionally randomizes per-token segment
    lengths and inserts pauses (see synthesize_wav), restoring
    discriminative power to the alignment-diagonality metric."""
    utts = []
    for i in range(n):
        spk = i % num_speakers
        if variable:
            rng = np.random.default_rng((0xC0A9, i))
            target_chars = int(rng.integers(12, 171))
            words = []
            length = 0
            while length < target_chars:
                w = _SYNTH_WORDS[int(rng.integers(0, len(_SYNTH_WORDS)))]
                words.append(w)
                length += len(w) + 1
            text = " ".join(words) + "."
        else:
            text = _SYNTH_SENTENCES[i % len(_SYNTH_SENTENCES)]
        utts.append(Utterance(f"synth_{i:05d}", text, None, f"S{spk}", spk,
                              nonlinear_durations=nonlinear_durations))
    return utts


def synthesize_wav(utt: Utterance, audio: AudioConfig) -> np.ndarray:
    """Deterministic token-driven harmonic stack standing in for speech.

    Each token contributes a short segment whose fundamental and formant mix
    depend on the token id, so mel content correlates with text — enough
    signal for attention to have something to align to in smoke training.
    """
    tokens = text_to_ids(utt.text)
    base_seg = int(0.08 * audio.sample_rate)
    # stable per-utterance seed from the id bytes (hash() is salted per
    # process, which would desync wavs across pattern workers / hosts)
    seed = np.frombuffer(
        utt.utt_id.encode("utf-8").ljust(8, b"\0")[:8], np.uint64)[0]
    rng = np.random.default_rng((0x5EED, int(seed)))
    drng = np.random.default_rng((0xD07A, int(seed)))
    pieces = []
    phase = 0.0
    for tok in tokens:
        if utt.nonlinear_durations:
            # log-uniform per-token duration in [0.03, 0.19] s — a ~6x
            # spread, so the token->frame slope varies word to word
            seg = int(base_seg * np.exp(drng.uniform(-0.98, 0.86)))
            if drng.random() < 0.06:
                # inserted pause: silence the aligner must skip over
                pieces.append(np.zeros(
                    int(audio.sample_rate * drng.uniform(0.05, 0.25)),
                    np.float64))
        else:
            seg = base_seg
        f0 = 90.0 + 12.0 * (tok % 23) + 25.0 * utt.speaker_id
        t = np.arange(seg) / audio.sample_rate
        sig = np.zeros(seg)
        for h, amp in ((1, 1.0), (2, 0.5), (3, 0.3), (4, 0.2)):
            sig += amp * np.sin(2 * np.pi * f0 * h * t + phase)
        formant = 500.0 + 80.0 * (tok % 11)
        sig *= 0.6 + 0.4 * np.sin(2 * np.pi * formant * t / 100.0)
        env = np.minimum(1.0, np.minimum(np.arange(seg), seg - np.arange(seg)) / (0.1 * seg))
        pieces.append(0.3 * sig * env + 0.005 * rng.standard_normal(seg))
        phase += 2 * np.pi * f0 * seg / audio.sample_rate
    return np.concatenate(pieces).astype(np.float32)


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------


def load_wav(path: str, target_sr: int) -> np.ndarray:
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    if sr != target_sr:
        # polyphase resample
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(sr, target_sr)
        wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
    return wav


def prepare_wav(utt: Utterance, audio: AudioConfig
                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Host prep shared by both feature paths: tokenize, load/synthesize,
    trim, peak-normalize. Returns (tokens, wav) or None if too short."""
    tokens = np.asarray(text_to_ids(utt.text), np.int32)
    if utt.wav_path is None:
        wav = synthesize_wav(utt, audio)
    else:
        wav = load_wav(utt.wav_path, audio.sample_rate)
        wav = dsp_ref.trim_silence(wav, audio)
    if len(wav) < audio.n_fft:
        return None
    peak = np.abs(wav).max()
    if peak > 1.0:
        wav = wav / peak
    return tokens, wav


def write_pattern(utt: Utterance, tokens: np.ndarray, wav: np.ndarray,
                  mel: Optional[np.ndarray], linear: Optional[np.ndarray],
                  out_dir: str, store_wav: bool,
                  mel_len: Optional[int] = None) -> dict:
    path = os.path.join(out_dir, utt.utt_id + ".npz")
    arrays = dict(
        tokens=tokens,
        speaker_id=np.int32(utt.speaker_id),
        text=np.str_(utt.text),
    )
    wav_only = mel is None
    if wav_only:
        # wav-only shard (the wav-transport/device-corpus training path
        # never reads offline features): the waveform is stored float16 —
        # the train wire is float16 anyway, and offline mel/linear at 13k
        # utterances would be ~60 GB of dead weight on disk
        arrays["wav"] = wav.astype(np.float16)
    else:
        arrays["mel"] = mel.astype(np.float32)
        arrays["linear"] = linear.astype(np.float32)
        if store_wav:
            arrays["wav"] = wav.astype(np.float32)
    np.savez_compressed(path, **arrays)
    return {
        "id": utt.utt_id,
        "file": os.path.basename(path),
        "text_len": int(len(tokens)),
        "mel_len": int(mel.shape[0]) if mel is not None else int(mel_len),
        "speaker_id": int(utt.speaker_id),
        "speaker": utt.speaker,
        "has_wav": bool(store_wav or wav_only),
        "wav_only": wav_only,
    }


def extract_pattern(utt: Utterance, audio: AudioConfig, out_dir: str,
                    store_wav: bool = False,
                    wav_only: bool = False) -> Optional[dict]:
    """Extract (host numpy DSP) and write one pattern file.

    `store_wav` additionally stores the (normalized) waveform — needed for
    neural-vocoder training (config 5), where targets are samples not frames.
    `wav_only` skips the offline feature extraction entirely and stores just
    tokens + waveform (the wav-transport training path computes features on
    device; mel_len for bucketing is 1 + len(wav)//hop, the centered-STFT
    frame count — asserted against dsp_ref in tests).
    """
    prep = prepare_wav(utt, audio)
    if prep is None:
        return None
    tokens, wav = prep
    if wav_only:
        return write_pattern(utt, tokens, wav, None, None, out_dir, True,
                             mel_len=1 + len(wav) // audio.hop_length)
    mel = dsp_ref.melspectrogram(wav, audio)
    linear = dsp_ref.spectrogram(wav, audio)
    return write_pattern(utt, tokens, wav, mel, linear, out_dir, store_wav)


def _device_feature_results(utts, audio, out_dir, store_wav,
                            chunk_size: int = 64):
    """Two-phase extraction: host prep (trim/normalize) in chunks, then ONE
    batched on-device program per bucket shape for the STFT/mel FLOPs —
    the Pallas kernel on TPU (north star "on-TPU feature extraction")."""
    from ..dsp.device_features import DeviceFeatureExtractor

    extractor = DeviceFeatureExtractor(audio)
    for start in range(0, len(utts), chunk_size):
        chunk = utts[start : start + chunk_size]
        prepped = [(u, prepare_wav(u, audio)) for u in chunk]
        kept = [(u, p) for u, p in prepped if p is not None]
        for u, p in prepped:
            if p is None:
                yield None
        if not kept:
            continue
        feats = extractor.extract([wav for _, (_, wav) in kept])
        for (u, (tokens, wav)), (mel, linear) in zip(kept, feats):
            yield write_pattern(u, tokens, wav, mel, linear, out_dir,
                                store_wav)


def generate_patterns(
    utts: Iterable[Utterance],
    audio: AudioConfig,
    out_dir: str,
    num_workers: int = 1,
    max_text_len: int = 10000,
    max_mel_frames: int = 100000,
    store_wav: bool = False,
    device_features: bool = False,
    wav_only: bool = False,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    if wav_only and device_features:
        # ADVICE r4: the device-features branch always writes full
        # mel/linear features, so combining the flags would silently produce
        # shards 15x larger than requested with no wav_only metadata.
        raise ValueError(
            "wav_only and device_features are mutually exclusive: wav-only "
            "shards skip feature extraction entirely (features are computed "
            "on-device at train time), so there is nothing for the device "
            "extractor to do")
    utts = list(utts)
    entries = []
    if device_features:
        results = _device_feature_results(utts, audio, out_dir, store_wav)
    elif num_workers > 1:
        with ProcessPoolExecutor(num_workers) as pool:
            results = pool.map(
                extract_pattern, utts, [audio] * len(utts), [out_dir] * len(utts),
                [store_wav] * len(utts), [wav_only] * len(utts),
            )
    else:
        results = (extract_pattern(u, audio, out_dir, store_wav, wav_only)
                   for u in utts)
    for entry in results:
        if entry is None:
            continue
        if entry["text_len"] > max_text_len or entry["mel_len"] > max_mel_frames:
            continue
        entries.append(entry)

    speakers = sorted({e["speaker"] for e in entries})
    import dataclasses

    metadata = {
        # FULL audio config (r4: wav-only shards carry no offline features,
        # so downstream mel computation must reconstruct the exact params;
        # the trainer's n_fft/hop/sr/num_mels validation reads these too)
        "audio": dataclasses.asdict(audio),
        "num_speakers": len(speakers),
        "speakers": speakers,
        "entries": entries,
    }
    with open(os.path.join(out_dir, METADATA_FILE), "w") as f:
        json.dump(metadata, f)
    return metadata


def main(argv: Optional[List[str]] = None) -> None:
    from ..utils.platform import enable_compile_cache, respect_platforms_env
    respect_platforms_env()
    enable_compile_cache()
    p = argparse.ArgumentParser(description="Offline pattern generation")
    p.add_argument("--corpus", choices=["ljspeech", "vctk", "synthetic"],
                   required=True)
    p.add_argument("--path", help="corpus root (ljspeech/vctk)")
    p.add_argument("--out", required=True, help="output pattern directory")
    p.add_argument("--config", help="config JSON (default: preset taco1_lj)")
    p.add_argument("--num-utterances", type=int, default=200,
                   help="synthetic corpus size")
    p.add_argument("--num-speakers", type=int, default=1,
                   help="synthetic speaker count")
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    p.add_argument("--store-wav", action="store_true",
                   help="also store waveforms (for vocoder training)")
    p.add_argument("--device-features", action="store_true",
                   help="extract features on the accelerator (batched Pallas "
                        "STFT kernel on TPU) instead of host numpy")
    p.add_argument("--wav-only", action="store_true",
                   help="store tokens + float16 waveform only, skipping "
                        "offline feature extraction (for wav-transport/"
                        "device-corpus training; ~15x smaller shards)")
    p.add_argument("--variable-lengths", action="store_true",
                   help="synthetic corpus: unique word-sequence sentences "
                        "with ~12-170 char lengths (occupies all buckets) "
                        "instead of the 16-sentence cycle")
    p.add_argument("--nonlinear-durations", action="store_true",
                   help="synthetic corpus: random per-token durations "
                        "(log-uniform ~6x spread) + inserted pauses, so "
                        "token->time is not constant-slope and alignment "
                        "diagonality < 1.0 is achievable/meaningful")
    args = p.parse_args(argv)

    cfg: Config = load_config(args.config) if args.config else get_preset("taco1_lj")
    if args.corpus == "ljspeech":
        utts = walk_ljspeech(args.path)
    elif args.corpus == "vctk":
        utts = walk_vctk(args.path)
    else:
        utts = synthetic_utterances(args.num_utterances, args.num_speakers,
                                    variable=args.variable_lengths,
                                    nonlinear_durations=args.nonlinear_durations)
    meta = generate_patterns(utts, cfg.audio, args.out, num_workers=args.workers,
                             max_text_len=cfg.data.max_text_len,
                             max_mel_frames=cfg.data.max_mel_frames,
                             store_wav=args.store_wav,
                             device_features=args.device_features,
                             wav_only=args.wav_only)
    print(f"wrote {len(meta['entries'])} patterns to {args.out}")


if __name__ == "__main__":
    main()
