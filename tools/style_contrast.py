"""Quantify GST style control on a trained model (VERDICT r3 item 7).

Synthesizes the SAME text under several style conditions — >=3 one-hot
style-token weightings, the uniform-weight neutral condition, and a
reference-wav condition — and reports numeric style-contrast metrics:

  * pairwise mel-spectral distance (L1 over the shorter decode, in
    normalized-dB mel units) between condition outputs,
  * pairwise distance between the REF-ENCODER EMBEDDINGS of the outputs
    (the model's own style space: if the GST pathway does anything, mels
    synthesized under different tokens must embed apart),
  * a seed-noise floor: the same neutral condition synthesized under two
    different PRNG seeds (prenet dropout noise). Style contrast is only
    evidence if between-condition distances clear this floor.

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/style_contrast.py \
      --workdir /root/tpu_work/round4/flagship --out demo/round4/style_contrast.json
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--text", default="style tokens shape the voice of this "
                                     "sentence.")
    p.add_argument("--tokens", default="0,3,5,7",
                   help="comma list of one-hot token indices to contrast")
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
    synth = Synthesizer(cfg, model, variables)
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

    outs = {}
    for name, kw in conditions.items():
        outs[name] = synth([args.text], seed=0, **kw)
        print(f"[style] {name}: {int(outs[name]['frame_lengths'][0])} frames")
    # seed-noise floor: neutral condition, different dropout seed
    outs["uniform_seed1"] = synth([args.text], seed=1,
                                  **conditions["uniform"])

    # -- metrics --------------------------------------------------------------
    def mel_of(name):
        o = outs[name]
        fl = int(o["frame_lengths"][0])
        return np.asarray(o["mel"][0][:fl])

    def mel_dist(a, b):
        t = min(a.shape[0], b.shape[0])
        return float(np.mean(np.abs(a[:t] - b[:t])))

    # the model's own style space: embed each OUTPUT mel via the trained
    # reference encoder (fused kernel path — the production embedding)
    from gst_tacotron_tpu.ops.refenc_pallas import gst_style_from_params
    import jax.numpy as jnp

    t_max = max(mel_of(n).shape[0] for n in outs)
    t_max = ((t_max + 63) // 64) * 64

    @jax.jit
    def embed(mel, length):
        style, _ = gst_style_from_params(
            variables, cfg.model.gst, mel, length,
            interpret=jax.default_backend() == "cpu")
        return style[0]

    emb = {}
    for name in outs:
        m = mel_of(name)
        pad = np.zeros((1, t_max, cfg.model.num_mels), np.float32)
        pad[0, : m.shape[0]] = m
        emb[name] = np.asarray(
            embed(jnp.asarray(pad), jnp.asarray([m.shape[0]], np.int32)))

    def emb_dist(a, b):
        return float(np.linalg.norm(emb[a] - emb[b]))

    def emb_cos(a, b):
        va, vb = emb[a], emb[b]
        return float(np.dot(va, vb)
                     / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-9))

    style_names = [n for n in conditions if n != "uniform"] + ["uniform"]
    pairs = {}
    for a, b in itertools.combinations(style_names, 2):
        pairs[f"{a}|{b}"] = {
            "mel_l1": mel_dist(mel_of(a), mel_of(b)),
            "embed_l2": emb_dist(a, b),
            "embed_cos": emb_cos(a, b),
        }
    floor = {
        "mel_l1": mel_dist(mel_of("uniform"), mel_of("uniform_seed1")),
        "embed_l2": emb_dist("uniform", "uniform_seed1"),
        "embed_cos": emb_cos("uniform", "uniform_seed1"),
    }
    cross = [v["mel_l1"] for v in pairs.values()]
    report = {
        "workdir": args.workdir,
        "step": int(np.asarray(jax.device_get(state.step))),
        "text": args.text,
        "conditions": sorted(style_names),
        "pairwise": pairs,
        "seed_noise_floor": floor,
        "summary": {
            "min_cross_condition_mel_l1": min(cross),
            "mean_cross_condition_mel_l1": float(np.mean(cross)),
            "seed_floor_mel_l1": floor["mel_l1"],
            "min_contrast_over_floor": (min(cross)
                                        / max(floor["mel_l1"], 1e-9)),
            "mean_contrast_over_floor": (float(np.mean(cross))
                                         / max(floor["mel_l1"], 1e-9)),
            "frame_lengths": {n: int(outs[n]["frame_lengths"][0])
                              for n in style_names},
            # pacing is style too: same text, same seed — only the token
            # condition changes the decode length. The seed-noise length
            # delta (uniform vs uniform_seed1) is the floor for THAT.
            "frame_length_seed_delta": abs(
                int(outs["uniform"]["frame_lengths"][0])
                - int(outs["uniform_seed1"]["frame_lengths"][0])),
            "embedding_note": (
                "the output-mel ref-encoder embedding is dropout-noisy "
                "(seed-floor embed_l2 comparable to cross-condition) — "
                "mel_l1 and frame-length contrasts are the reliable "
                "metrics on this model"),
        },
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    s = report["summary"]
    print(f"[style] min cross-condition mel L1 {s['min_cross_condition_mel_l1']:.4f} "
          f"vs seed floor {s['seed_floor_mel_l1']:.4f} "
          f"({s['contrast_over_floor']:.1f}x) -> {args.out}")


if __name__ == "__main__":
    main()
