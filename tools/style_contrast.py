"""Quantify GST style control on a trained model (VERDICT r3 #7, r4 #7).

Synthesizes the SAME text under several style conditions — >=3 one-hot
style-token weightings, the uniform-weight neutral condition, and a
reference-wav condition — and reports numeric style-contrast metrics.

r5 upgrade (VERDICT r4 #7): the r4 numbers were contaminated by prenet
dropout noise (min cross-condition pair 1.11x a floor estimated from ONE
seed pair). Two de-noised views now:

  * DETERMINISTIC-PRENET pass (the primary evidence): synthesis is a
    deterministic function of (text, condition) — the same condition under
    two seeds is verified bit-identical (floor = 0), so EVERY nonzero
    pairwise distance is style, not noise.
  * stochastic pass with an N-seed floor: the production sampling mode,
    floored by mean over >=4 independent seed pairs instead of one.

Per-condition acoustic statistics (F0 via autocorrelation, RMS energy,
spectral centroid, decoded frame length) show WHAT the style tokens change.

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/style_contrast.py \
      --workdir /root/tpu_work/round4/flagship --out demo/round5/style_contrast.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_trained(workdir):
    import jax

    from gst_tacotron_tpu.checkpoint import CheckpointManager
    from gst_tacotron_tpu.config import load_config
    from gst_tacotron_tpu.train import init_state

    cfg = load_config(os.path.join(workdir, "config.json"))
    rng = np.random.default_rng(0)
    sample = {
        "tokens": rng.integers(2, 40, (2, 32)).astype(np.int32),
        "token_lengths": np.full((2,), 32, np.int32),
        "mel": rng.random((2, 64, cfg.model.num_mels), np.float32),
        "mel_lengths": np.full((2,), 64, np.int32),
        "linear": rng.random((2, 64, cfg.model.num_freq), np.float32),
        "speaker_ids": np.zeros((2,), np.int32),
    }
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            model, state = init_state(cfg, jax.random.PRNGKey(0), sample)
    else:
        model, state = init_state(cfg, jax.random.PRNGKey(0), sample)
    state = jax.device_get(state)
    ckpt = CheckpointManager(os.path.join(workdir, cfg.train.checkpoint_dir))
    state = ckpt.restore(state)
    return cfg, model, state


def acoustic_stats(wav: np.ndarray, sr: int) -> dict:
    """F0 (autocorr over the loudest 0.5 s), RMS, spectral centroid."""
    wav = np.asarray(wav, np.float64)
    if len(wav) < sr // 10:
        return {"f0_hz": 0.0, "rms": 0.0, "centroid_hz": 0.0}
    # loudest 0.5 s window
    win = min(len(wav), sr // 2)
    e = np.convolve(wav ** 2, np.ones(win), "valid")
    s0 = int(np.argmax(e))
    seg = wav[s0: s0 + win]
    rms = float(np.sqrt(np.mean(seg ** 2)))
    # autocorrelation F0 in [60, 400] Hz
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    lo, hi = sr // 400, sr // 60
    f0 = float(sr / (lo + np.argmax(ac[lo:hi]))) if hi < len(ac) else 0.0
    # spectral centroid of the segment
    sp = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), 1.0 / sr)
    centroid = float((sp * freqs).sum() / max(sp.sum(), 1e-9))
    return {"f0_hz": round(f0, 1), "rms": round(rms, 5),
            "centroid_hz": round(centroid, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--text", default="style tokens shape the voice of this "
                                     "sentence.")
    p.add_argument("--tokens", default="0,3,5,7",
                   help="comma list of one-hot token indices to contrast")
    p.add_argument("--floor-seeds", type=int, default=4,
                   help="seed pairs for the stochastic-pass noise floor")
    args = p.parse_args()

    import jax

    from gst_tacotron_tpu.utils.platform import (
        enable_compile_cache, respect_platforms_env,
    )

    respect_platforms_env()
    enable_compile_cache()

    from gst_tacotron_tpu.synthesize import Synthesizer

    cfg, model, state = load_trained(args.workdir)
    assert cfg.model.gst.enabled, "style contrast requires a GST config"
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    synth_det = Synthesizer(cfg, model, variables, deterministic_prenet=True)
    synth_sto = Synthesizer(cfg, model, variables)
    n_tok = cfg.model.gst.num_tokens

    conditions = {}
    for t in [int(x) for x in args.tokens.split(",")]:
        w = np.zeros((1, n_tok), np.float32)
        w[0, t] = 1.0
        conditions[f"token{t}"] = dict(token_weights=w)
    conditions["uniform"] = dict(
        token_weights=np.full((1, n_tok), 1.0 / n_tok, np.float32))
    # reference-wav condition: a deterministic synthetic utterance's audio
    from gst_tacotron_tpu.data.pattern import (
        synthesize_wav, synthetic_utterances,
    )

    ref_utt = synthetic_utterances(4, num_speakers=1)[3]
    conditions["ref_wav"] = dict(
        reference_wavs=[synthesize_wav(ref_utt, cfg.audio)])

    def mel_of(o):
        fl = int(o["frame_lengths"][0])
        return np.asarray(o["mel"][0][:fl])

    def mel_dist(a, b):
        t = min(a.shape[0], b.shape[0])
        return float(np.mean(np.abs(a[:t] - b[:t])))

    # ---- deterministic pass (primary) --------------------------------------
    det = {}
    for name, kw in conditions.items():
        det[name] = synth_det([args.text], seed=0, **kw)
        print(f"[style/det] {name}: {int(det[name]['frame_lengths'][0])} "
              "frames")
    # determinism check: same condition, different seed -> identical output
    det_check = synth_det([args.text], seed=123, **conditions["uniform"])
    det_floor = mel_dist(mel_of(det["uniform"]), mel_of(det_check))
    det_bitident = bool(np.array_equal(
        mel_of(det["uniform"]), mel_of(det_check)))

    style_names = [n for n in conditions if n != "uniform"] + ["uniform"]
    det_pairs = {}
    for a, b in itertools.combinations(style_names, 2):
        det_pairs[f"{a}|{b}"] = {
            "mel_l1": mel_dist(mel_of(det[a]), mel_of(det[b])),
            "frame_delta": abs(int(det[a]["frame_lengths"][0])
                               - int(det[b]["frame_lengths"][0])),
        }
    det_stats = {
        n: {**acoustic_stats(np.asarray(det[n]["wav"][0])
                             [: int(det[n]["wav_lengths"][0])],
                             cfg.audio.sample_rate),
            "frames": int(det[n]["frame_lengths"][0])}
        for n in style_names
    }

    # ---- stochastic pass with N-seed floor ----------------------------------
    sto = {}
    for name, kw in conditions.items():
        sto[name] = synth_sto([args.text], seed=0, **kw)
    floor_vals = []
    for s in range(args.floor_seeds):
        o2 = synth_sto([args.text], seed=1000 + s, **conditions["uniform"])
        floor_vals.append(mel_dist(mel_of(sto["uniform"]), mel_of(o2)))
    sto_floor = float(np.mean(floor_vals))
    sto_pairs = {}
    for a, b in itertools.combinations(style_names, 2):
        sto_pairs[f"{a}|{b}"] = mel_dist(mel_of(sto[a]), mel_of(sto[b]))

    det_cross = [v["mel_l1"] for v in det_pairs.values()]
    sto_cross = list(sto_pairs.values())
    report = {
        "workdir": args.workdir,
        "step": int(np.asarray(jax.device_get(state.step))),
        "text": args.text,
        "conditions": sorted(style_names),
        "deterministic_pass": {
            "pairwise": det_pairs,
            "acoustic_stats": det_stats,
            "seed_floor_mel_l1": det_floor,
            "seed_floor_bit_identical": det_bitident,
            "min_cross_condition_mel_l1": min(det_cross),
            "mean_cross_condition_mel_l1": float(np.mean(det_cross)),
        },
        "stochastic_pass": {
            "pairwise_mel_l1": sto_pairs,
            "seed_floor_mel_l1_mean_of": args.floor_seeds,
            "seed_floor_mel_l1": sto_floor,
            "seed_floor_values": floor_vals,
            "min_contrast_over_floor": min(sto_cross) / max(sto_floor, 1e-9),
            "mean_contrast_over_floor": (float(np.mean(sto_cross))
                                         / max(sto_floor, 1e-9)),
        },
        "summary": {
            "verdict": (
                "with the prenet deterministic, the same condition under "
                "two seeds is {}: every nonzero pairwise mel L1 below is "
                "style, not sampling noise".format(
                    "bit-identical" if det_bitident
                    else f"within {det_floor:.2e}")),
            "det_min_pair_mel_l1": min(det_cross),
            "det_mean_pair_mel_l1": float(np.mean(det_cross)),
            "sto_min_contrast_over_floor": (min(sto_cross)
                                            / max(sto_floor, 1e-9)),
            "frame_lengths": {n: int(det[n]["frame_lengths"][0])
                              for n in style_names},
        },
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    s = report["summary"]
    print(f"[style] det min pair mel L1 {s['det_min_pair_mel_l1']:.4f} "
          f"(floor {'0 (bit-identical)' if det_bitident else det_floor}); "
          f"stochastic min contrast/floor "
          f"{s['sto_min_contrast_over_floor']:.1f}x -> {args.out}")


if __name__ == "__main__":
    main()
