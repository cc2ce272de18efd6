"""Synthesizer fast path (fused Pallas decode kernel) vs standard path."""

import jax
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.synthesize import Synthesizer
from gst_tacotron_tpu.train import Trainer

from tests.test_train_smoke import small_cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = small_cfg("gst_lj")
    cfg = apply_overrides(cfg, {"model.decoder.max_decode_steps": 6,
                                "audio.griffin_lim_iters": 2})
    patterns = str(tmp_path_factory.mktemp("p"))
    generate_patterns(synthetic_utterances(4), cfg.audio, patterns)
    trainer = Trainer(cfg, patterns, str(tmp_path_factory.mktemp("w")))
    state = trainer.train(total_steps=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, trainer.model, variables


def test_pallas_path_matches_standard(trained):
    cfg, model, variables = trained
    texts = ["hello world.", "testing the fast path."]

    std = Synthesizer(cfg, model, variables)
    fast = Synthesizer(cfg, model, variables, use_pallas_decoder=True)
    assert fast.use_pallas_decoder

    # deterministic comparison needs dropout off in both paths: on CPU the
    # kernel path has no dropout; the standard path uses jax.random. Compare
    # structure + coarse values rather than exact frames.
    o_std = std(texts, seed=0)
    o_fast = fast(texts, seed=0)
    for k in ["mel", "linear", "alignments", "frame_lengths", "wav"]:
        assert o_fast[k].shape == o_std[k].shape, k
    assert np.all(np.isfinite(o_fast["wav"]))
    assert np.all(np.isfinite(o_fast["mel"]))
    # alignments are proper distributions
    np.testing.assert_allclose(o_fast["alignments"].sum(-1), 1.0, atol=1e-4)
    assert "style_attention" in o_fast


def test_pallas_refenc_path_matches_standard(trained):
    """GST fast path (fused reference-encoder kernel + STL-from-params,
    VERDICT r2 #2b) must match the flax-module path EXACTLY given the same
    dropout seed (the style computation itself has no randomness)."""
    cfg, model, variables = trained
    texts = ["kernel style path.", "same bits expected."]

    std = Synthesizer(cfg, model, variables, use_pallas_refenc=False)
    fast = Synthesizer(cfg, model, variables, use_pallas_refenc=True)
    assert fast.use_pallas_refenc

    # token-weights style source (no reference wav)
    w = np.zeros((2, cfg.model.gst.num_tokens), np.float32)
    w[:, 2] = 1.0
    o_std = std(texts, token_weights=w, seed=0)
    o_fast = fast(texts, token_weights=w, seed=0)
    np.testing.assert_allclose(o_fast["style_embedding"],
                               o_std["style_embedding"], atol=1e-5)
    np.testing.assert_allclose(o_fast["mel"], o_std["mel"], atol=1e-4)
    np.testing.assert_allclose(o_fast["style_attention"],
                               o_std["style_attention"], atol=1e-5)

    # reference-wav style source (exercises the fused conv stack + GRU)
    rng = np.random.default_rng(0)
    ref = (0.1 * rng.standard_normal(cfg.audio.sample_rate // 4)).astype(
        np.float32)
    o_std = std(texts, reference_wavs=[ref, ref], seed=0)
    o_fast = fast(texts, reference_wavs=[ref, ref], seed=0)
    np.testing.assert_allclose(o_fast["style_embedding"],
                               o_std["style_embedding"], atol=1e-5)
    np.testing.assert_allclose(o_fast["mel"], o_std["mel"], atol=1e-4)


def test_pallas_path_location_sensitive_r1(tmp_path):
    """Config-3 shape (LSA, r=1) through the fused kernel (VERDICT r1 #4)."""
    cfg = small_cfg("gst_r1_location", **{
        "model.decoder.max_decode_steps": 6,
        "model.attention.location_filters": 4,
        "model.attention.location_kernel_size": 7,
        "audio.griffin_lim_iters": 2,
    })
    assert cfg.model.decoder.reduction_factor == 1
    patterns = str(tmp_path / "p")
    generate_patterns(synthetic_utterances(4), cfg.audio, patterns)
    trainer = Trainer(cfg, patterns, str(tmp_path / "w"))
    state = trainer.train(total_steps=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    fast = Synthesizer(cfg, trainer.model, variables, use_pallas_decoder=True)
    assert fast.use_pallas_decoder
    std = Synthesizer(cfg, trainer.model, variables)
    o_fast = fast(["location test."], seed=0)
    o_std = std(["location test."], seed=0)
    for k in ["mel", "linear", "alignments", "frame_lengths", "wav"]:
        assert o_fast[k].shape == o_std[k].shape, k
    assert np.all(np.isfinite(o_fast["wav"]))
    np.testing.assert_allclose(o_fast["alignments"].sum(-1), 1.0, atol=1e-4)


def test_pallas_path_falls_back_out_of_scope(trained):
    cfg, model, variables = trained
    cfg3 = apply_overrides(cfg, {"model.decoder.num_decoder_rnn_layers": 3})
    s = Synthesizer(cfg3, model, variables, use_pallas_decoder=True)
    assert not s.use_pallas_decoder  # 3 GRU layers -> jnp scan path


def test_gst_reference_wav_conditioning(trained):
    """Style transfer from a reference wav: the ref mel is extracted by the
    on-device batched program (VERDICT r1 #2), not host numpy."""
    cfg, model, variables = trained
    rng = np.random.default_rng(5)
    ref_wavs = [rng.uniform(-0.4, 0.4, 3000).astype(np.float32)]
    synth = Synthesizer(cfg, model, variables)
    out = synth(["styled speech."], reference_wavs=ref_wavs, seed=2)
    assert synth._ref_extractor is not None
    assert out["style_attention"].shape[0] == 1
    assert np.all(np.isfinite(out["wav"]))
    # different reference audio -> different style embedding
    ref2 = [np.zeros(3000, np.float32)]
    out2 = synth(["styled speech."], reference_wavs=ref2, seed=2)
    assert not np.allclose(out["style_embedding"], out2["style_embedding"])


def test_chunked_decoder_path(trained):
    cfg, model, variables = trained
    chunked = Synthesizer(cfg, model, variables, use_chunked_decoder=True,
                          chunk_steps=2)
    assert chunked.use_chunked_decoder
    out = chunked(["early exit test."], seed=1)
    assert out["wav"].shape[0] == 1
    assert np.all(np.isfinite(out["wav"]))
    assert "chunks_run" in out
    assert int(out["chunks_run"]) >= 1
