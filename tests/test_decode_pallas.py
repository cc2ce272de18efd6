"""Fused whole-decode Pallas kernel vs the jnp scan decoder (interpreter
mode on CPU; SURVEY.md §4 'Pallas kernel vs jnp-reference kernel allclose').

Covers both attention kinds: Bahdanau (flagship, r=2) and location-sensitive
(config 3, r=1 — VERDICT r1 #4), including the folded location-conv taps and
the VMEM-resident alignment state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import AttentionConfig, DecoderConfig
from gst_tacotron_tpu.models.decoder import Decoder
from gst_tacotron_tpu.ops.decode_pallas import (
    decode_scan_pallas,
    pack_decoder_weights,
)

NUM_MELS = 8
MEM_DIM = 16


def make_cfgs(kind: str, r: int, cumulative: bool = True):
    dec = DecoderConfig(
        prenet_dims=(16, 8),
        attention_rnn_dim=16,
        decoder_rnn_dim=16,
        num_decoder_rnn_layers=2,
        reduction_factor=r,
        max_decode_steps=6,
        use_stop_token=True,
    )
    attn = AttentionConfig(kind=kind, dim=16, location_filters=4,
                           location_kernel_size=7, cumulative=cumulative)
    return dec, attn


def build(dec_cfg, attn_cfg):
    rng = np.random.default_rng(0)
    dec = Decoder(dec_cfg, attn_cfg, NUM_MELS, MEM_DIM)
    memory = jnp.asarray(rng.standard_normal((2, 9, MEM_DIM)), jnp.float32)
    lengths = jnp.array([9, 6])
    mel = jnp.zeros((2, 4 * dec_cfg.reduction_factor, NUM_MELS))
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        memory, lengths, mel, method=dec.teacher_forced,
    )
    return dec, variables, memory, lengths


@pytest.mark.parametrize("kind,r,cumulative", [
    ("bahdanau", 2, True),
    ("location_sensitive", 1, True),
    ("location_sensitive", 2, False),
])
def test_kernel_matches_scan_decoder(kind, r, cumulative):
    dec_cfg, attn_cfg = make_cfgs(kind, r, cumulative)
    dec, variables, memory, lengths = build(dec_cfg, attn_cfg)

    # reference: jnp scan decode with dropout off
    mel_ref, stops_ref, aligns_ref, fl = dec.apply(
        variables, memory, lengths, deterministic_prenet=True,
        method=dec.decode, rngs={"dropout": jax.random.PRNGKey(9)},
    )

    cell_params = variables["params"]["cell"]
    keys = dec.apply(
        variables, memory,
        method=lambda m, mem: m.cell.precompute_keys(mem),
    )
    mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]

    packed = pack_decoder_weights(cell_params, NUM_MELS,
                                  dec_cfg.reduction_factor,
                                  tuple(dec_cfg.prenet_dims))
    if kind == "location_sensitive":
        assert packed["loca"].shape == (
            attn_cfg.location_kernel_size * (2 if cumulative else 1),
            attn_cfg.dim,
        )
    mel_k, stops_k, aligns_k = decode_scan_pallas(
        packed, memory, keys, mask,
        dec_cfg=dec_cfg, attn_cfg=attn_cfg, num_mels=NUM_MELS,
        steps=dec_cfg.max_decode_steps, use_dropout=False, interpret=True,
    )

    assert mel_k.shape == mel_ref.shape
    assert stops_k.shape == stops_ref.shape
    assert aligns_k.shape == aligns_ref.shape
    np.testing.assert_allclose(np.asarray(aligns_k), np.asarray(aligns_ref),
                               atol=1e-4)
    # the scan decoder zero-masks frames past the stop; compare raw regions
    # where the reference is unmasked, plus stop logits everywhere
    np.testing.assert_allclose(np.asarray(stops_k), np.asarray(stops_ref),
                               atol=1e-4)
    fl = np.asarray(fl)
    mel_k, mel_ref = np.asarray(mel_k), np.asarray(mel_ref)
    for b in range(2):
        np.testing.assert_allclose(mel_k[b, : fl[b]], mel_ref[b, : fl[b]],
                                   atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_seed has no CPU interpreter lowering; dropout mode is "
    "exercised on TPU (see tools/tpu_kernel_bench.py)",
)
def test_kernel_dropout_mode_runs():
    dec_cfg, attn_cfg = make_cfgs("bahdanau", 2)
    dec, variables, memory, lengths = build(dec_cfg, attn_cfg)
    cell_params = variables["params"]["cell"]
    keys = dec.apply(
        variables, memory,
        method=lambda m, mem: m.cell.precompute_keys(mem),
    )
    mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]
    packed = pack_decoder_weights(cell_params, NUM_MELS, 2,
                                  tuple(dec_cfg.prenet_dims))
    mel1, _, _ = decode_scan_pallas(
        packed, memory, keys, mask, dec_cfg=dec_cfg, attn_cfg=attn_cfg,
        num_mels=NUM_MELS, steps=4, seed=1, use_dropout=True, interpret=True,
    )
    mel2, _, _ = decode_scan_pallas(
        packed, memory, keys, mask, dec_cfg=dec_cfg, attn_cfg=attn_cfg,
        num_mels=NUM_MELS, steps=4, seed=2, use_dropout=True, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(mel1)))
    assert not np.allclose(np.asarray(mel1), np.asarray(mel2))
