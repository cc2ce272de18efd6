"""Regenerate the committed golden parity fixtures (SURVEY.md §4
"Golden/parity"; VERDICT r2 #3).

Writes tests/fixtures/golden/: a tiny deterministic GST config, a
seeded-init parameter pack (single .npz, flattened paths), and one
(text [, ref_wav] -> expected_mel) .npz per fixture sentence, produced by
the REAL synthesis path (Synthesizer: tokenize -> encode -> GST -> AR decode
-> postnet, on-device ref-mel extraction for the ref-wav case).

The fixtures pin today's synthesis outputs against tomorrow's refactor:
tests/test_golden_fixtures.py re-runs the same synthesis from the committed
pack and fails on any numeric drift. Regenerate ONLY when an intentional
semantic change invalidates them:

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/make_golden_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           "tests", "fixtures", "golden")

TEXTS = [
    "the quick brown fox.",
    "golden fixtures pin synthesis output.",
]
REF_TEXT = "style reference drives the tokens."

# deterministic pseudo-speech reference wav: summed harmonics with a slow
# amplitude envelope (synthetic but spectrally non-trivial)
def make_ref_wav(sr: int, seconds: float = 0.6) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    f0 = 160.0 + 40.0 * np.sin(2 * np.pi * 2.1 * t)
    wav = sum((0.5 ** k) * np.sin(2 * np.pi * (k + 1) * f0 * t)
              for k in range(4))
    env = 0.4 + 0.3 * np.sin(2 * np.pi * 1.3 * t)
    return (wav * env * 0.3).astype(np.float32)


def tiny_golden_config():
    from gst_tacotron_tpu.config import apply_overrides, get_preset

    ov = {
        "audio.n_fft": 512, "audio.hop_length": 128, "audio.win_length": 512,
        "audio.griffin_lim_iters": 2,
        "model.num_freq": 257,
        "model.encoder.embedding_dim": 32, "model.encoder.prenet_dims": [32, 16],
        "model.encoder.cbhg_bank_k": 4, "model.encoder.cbhg_bank_channels": 16,
        "model.encoder.cbhg_proj_channels": [16, 16],
        "model.encoder.cbhg_highway_layers": 2,
        "model.encoder.cbhg_highway_dim": 16, "model.encoder.cbhg_gru_dim": 16,
        "model.gst.ref_conv_channels": [4, 8], "model.gst.ref_gru_dim": 16,
        "model.gst.style_dim": 16,
        "model.attention.dim": 16,
        "model.decoder.prenet_dims": [32, 16],
        "model.decoder.attention_rnn_dim": 16,
        "model.decoder.decoder_rnn_dim": 16,
        "model.decoder.max_decode_steps": 12,
        # an untrained stop head must not truncate the fixture decode
        "model.decoder.stop_threshold": 1.5,
        "model.postnet.cbhg_bank_k": 3, "model.postnet.cbhg_bank_channels": 8,
        "model.postnet.cbhg_proj_channels": [16, 80],
        "model.postnet.cbhg_highway_layers": 1,
        "model.postnet.cbhg_highway_dim": 16, "model.postnet.cbhg_gru_dim": 16,
    }
    return apply_overrides(get_preset("gst_lj"), ov)


PROD_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests", "fixtures", "golden_prod")
PROD_TEXTS = [
    "production dimensions pin the full numeric path.",
]


def prod_golden_config():
    """FULL production dims (VERDICT r3 item 8: the tiny fixture left
    n_fft 2048 / 6-conv GST / 1025-bin postnet numerics ungated): the
    unmodified gst_lj preset, decode bounded for fixture speed."""
    from gst_tacotron_tpu.config import apply_overrides, get_preset

    return apply_overrides(get_preset("gst_lj"), {
        "model.decoder.max_decode_steps": 12,
        # an untrained stop head must not truncate the fixture decode
        "model.decoder.stop_threshold": 1.5,
        "audio.griffin_lim_iters": 2,  # mel is what the gate compares
    })


def _prod_init_variables(cfg):
    """Deterministic seeded init — the production param pack is ~80 MB,
    too large to commit, and init is reproducible; the gate therefore also
    pins init determinism."""
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.train import build_model

    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(4321), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 64, cfg.model.num_mels)),
        ref_mel=jnp.zeros((1, 64, cfg.model.num_mels)),
        ref_mel_lengths=jnp.array([64]), train=True,
    )
    return model, variables


def build_synth_prod(fixture_dir: str):
    """Rebuild the production-dim fixture Synthesizer (shared with the CI
    gate; params come from the seeded init, only config + expected mel are
    committed)."""
    from gst_tacotron_tpu.config import load_config
    from gst_tacotron_tpu.synthesize import Synthesizer

    cfg = load_config(os.path.join(fixture_dir, "config.json"))
    model, variables = _prod_init_variables(cfg)
    return cfg, Synthesizer(cfg, model, variables)


def flatten_tree(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def build_synth(fixture_dir: str):
    """Deterministically rebuild the fixture Synthesizer (shared with the
    CI gate, so generator and checker cannot diverge)."""
    import jax

    from gst_tacotron_tpu.config import load_config
    from gst_tacotron_tpu.train import build_model
    from gst_tacotron_tpu.synthesize import Synthesizer

    cfg = load_config(os.path.join(fixture_dir, "config.json"))
    model = build_model(cfg)
    with np.load(os.path.join(fixture_dir, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    variables = unflatten_tree(flat)
    variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
    return cfg, Synthesizer(cfg, model, variables)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gst_tacotron_tpu.config import save_config
    from gst_tacotron_tpu.parity import save_fixture
    from gst_tacotron_tpu.train import build_model

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    cfg = tiny_golden_config()
    save_config(cfg, os.path.join(FIXTURE_DIR, "config.json"))

    # seeded init (training is unnecessary for a drift gate and would make
    # regeneration minutes-slow; the untrained decode still runs every module)
    model = build_model(cfg)
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.PRNGKey(1234), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 4, cfg.model.num_mels)),
        ref_mel=jnp.zeros((1, 4, cfg.model.num_mels)),
        ref_mel_lengths=jnp.array([4]), train=True,
    )
    flat = flatten_tree(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables["batch_stats"])})
    np.savez_compressed(os.path.join(FIXTURE_DIR, "params.npz"), **flat)

    cfg, synth = build_synth(FIXTURE_DIR)
    for i, text in enumerate(TEXTS):
        out = synth([text], seed=0)
        save_fixture(os.path.join(FIXTURE_DIR, f"text_{i}.npz"),
                     text, np.asarray(out["mel"][0]))
        print(f"text_{i}: mel {out['mel'][0].shape} "
              f"|mel| {np.abs(out['mel'][0]).mean():.4f}")

    ref_wav = make_ref_wav(cfg.audio.sample_rate)
    out = synth([REF_TEXT], reference_wavs=[ref_wav], seed=0)
    save_fixture(os.path.join(FIXTURE_DIR, "ref_wav_0.npz"),
                 REF_TEXT, np.asarray(out["mel"][0]), ref_wav=ref_wav)
    print(f"ref_wav_0: mel {out['mel'][0].shape} "
          f"|mel| {np.abs(out['mel'][0]).mean():.4f}")
    print(f"fixtures written to {FIXTURE_DIR}")

    # -- production-dim fixture (full gst_lj preset numerics) ----------------
    os.makedirs(PROD_FIXTURE_DIR, exist_ok=True)
    pcfg = prod_golden_config()
    save_config(pcfg, os.path.join(PROD_FIXTURE_DIR, "config.json"))
    pcfg, psynth = build_synth_prod(PROD_FIXTURE_DIR)
    for i, text in enumerate(PROD_TEXTS):
        out = psynth([text], seed=0)
        save_fixture(os.path.join(PROD_FIXTURE_DIR, f"text_{i}.npz"),
                     text, np.asarray(out["mel"][0]))
        print(f"prod text_{i}: mel {out['mel'][0].shape} "
              f"|mel| {np.abs(out['mel'][0]).mean():.4f}")
    print(f"production-dim fixtures written to {PROD_FIXTURE_DIR}")


if __name__ == "__main__":
    main()
