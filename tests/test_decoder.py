"""Decoder scan tests: teacher forcing, AR decode, stop handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gst_tacotron_tpu.config import AttentionConfig, DecoderConfig
from gst_tacotron_tpu.models.decoder import Decoder

NUM_MELS = 8
MEM_DIM = 12

SMALL_DEC = DecoderConfig(
    prenet_dims=(16, 8),
    attention_rnn_dim=16,
    decoder_rnn_dim=16,
    num_decoder_rnn_layers=2,
    reduction_factor=2,
    max_decode_steps=12,
)
ATTN = AttentionConfig(kind="bahdanau", dim=16)


def make_decoder(dec_cfg=SMALL_DEC, attn_cfg=ATTN):
    return Decoder(dec_cfg, attn_cfg, NUM_MELS, MEM_DIM)


def make_inputs(batch=2, t_enc=9, t_mel=10):
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((batch, t_enc, MEM_DIM)), jnp.float32)
    mem_lengths = jnp.array([t_enc, t_enc - 3])
    mel = jnp.asarray(rng.standard_normal((batch, t_mel, NUM_MELS)), jnp.float32)
    return memory, mem_lengths, mel


def test_teacher_forced_shapes():
    dec = make_decoder()
    memory, lengths, mel = make_inputs()
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        memory, lengths, mel, method=dec.teacher_forced,
    )
    mel_out, stops, aligns = dec.apply(
        variables, memory, lengths, mel, method=dec.teacher_forced,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert mel_out.shape == mel.shape
    assert stops.shape == (2, 10)
    assert aligns.shape == (2, 5, 9)  # S = T_mel / r
    np.testing.assert_allclose(np.asarray(aligns.sum(-1)), 1.0, atol=1e-5)


def test_teacher_forced_rejects_unaligned_length():
    dec = make_decoder()
    memory, lengths, _ = make_inputs()
    bad_mel = jnp.zeros((2, 9, NUM_MELS))  # 9 % r(2) != 0
    with pytest.raises(AssertionError):
        dec.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            memory, lengths, bad_mel, method=dec.teacher_forced,
        )


def test_ar_decode_shapes_and_masking():
    dec = make_decoder()
    memory, lengths, mel = make_inputs()
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        memory, lengths, mel, method=dec.teacher_forced,
    )
    mel_out, stops, aligns, frame_lengths = dec.apply(
        variables, memory, lengths, method=dec.decode,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    steps = SMALL_DEC.max_decode_steps
    r = SMALL_DEC.reduction_factor
    assert mel_out.shape == (2, steps * r, NUM_MELS)
    assert stops.shape == (2, steps * r)
    assert aligns.shape == (2, steps, 9)
    assert frame_lengths.shape == (2,)
    assert np.all(np.asarray(frame_lengths) >= 1)
    # frames past frame_lengths are zeroed
    fl = np.asarray(frame_lengths)
    m = np.asarray(mel_out)
    for b in range(2):
        np.testing.assert_allclose(m[b, fl[b]:], 0.0, atol=1e-7)


def test_ar_decode_is_jittable_once():
    """The whole AR decode must be a single compiled program (no per-step
    dispatch — the reference's perf sin, SURVEY.md §3.3)."""
    dec = make_decoder()
    memory, lengths, mel = make_inputs()
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        memory, lengths, mel, method=dec.teacher_forced,
    )

    traces = []

    @jax.jit
    def decode(v, memory, lengths, rng):
        traces.append(1)
        return dec.apply(v, memory, lengths, method=dec.decode,
                         rngs={"dropout": rng})

    out1 = decode(variables, memory, lengths, jax.random.PRNGKey(0))
    out2 = decode(variables, memory, lengths, jax.random.PRNGKey(1))
    assert len(traces) == 1  # compiled exactly once
    assert out1[0].shape == out2[0].shape


def test_location_sensitive_decoder_r1():
    """Config-3 shape check: r=1 + location-sensitive attention."""
    dec_cfg = DecoderConfig(
        prenet_dims=(16, 8), attention_rnn_dim=16, decoder_rnn_dim=16,
        num_decoder_rnn_layers=2, reduction_factor=1, max_decode_steps=8,
    )
    attn_cfg = AttentionConfig(kind="location_sensitive", dim=16,
                               location_filters=4, location_kernel_size=7)
    dec = Decoder(dec_cfg, attn_cfg, NUM_MELS, MEM_DIM)
    memory, lengths, _ = make_inputs(t_mel=6)
    mel = jnp.zeros((2, 6, NUM_MELS))
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        memory, lengths, mel, method=dec.teacher_forced,
    )
    mel_out, stops, aligns, fl = dec.apply(
        variables, memory, lengths, method=dec.decode,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert mel_out.shape == (2, 8, NUM_MELS)
    assert aligns.shape == (2, 8, 9)
