"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline metric (BASELINE.json:2): audio-seconds synthesized / sec / chip on
the flagship GST-Tacotron config, full pipeline (text -> encoder + GST ->
fused AR decode scan -> post-net -> on-device Griffin-Lim -> waveform).

Baseline for `vs_baseline`: the reference (CODEJIN/GST_Tacotron, TF2) ships
no published numbers and no reference checkout exists in this sandbox
(SURVEY.md provenance; BASELINE.json "published": {}), so the baseline is a
*reference-architecture emulation measured on the same hardware*: the same
model weights driven the way the reference drives them — a per-step
host-dispatched decoder loop (one device call per decode step, SURVEY.md
§3.3) followed by host-side numpy Griffin-Lim. vs_baseline = fused / emulated.

Usage: python bench.py [--quick]
Env: runs on whatever jax.devices() provides (the driver provides 1 TPU chip).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print("[bench]", *a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persistent compilation cache (remote compiles here are slow and
    high-variance); single source of truth is utils/platform.py."""
    from gst_tacotron_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()


def build(cfg_overrides=None, checkpoint_workdir=None, batch=None):
    import jax

    from gst_tacotron_tpu.config import apply_overrides, get_preset, load_config
    from gst_tacotron_tpu.train import init_state

    ov = {
        # flagship dims (full-size GST-Tacotron), bounded decode length
        "model.decoder.max_decode_steps": 200,
        # Fast-GLA at 15 iterations is quality-neutral-or-better vs the
        # plain iteration at 30 (spectral error 0.163 vs 0.174 on harmonic
        # test signals at production audio params; fast-30 = 0.099 beats
        # even the reference's plain-60 = 0.119) and ~5 ms/batch cheaper —
        # see tests/test_dsp.py::test_griffin_lim_momentum_accelerates.
        "audio.griffin_lim_iters": 15,
        "audio.griffin_lim_momentum": 0.99,
        # Throughput is measured at FULL decode length: untrained stop heads
        # fire immediately (sigmoid(0)~0.5), which would shrink the audio
        # numerator while the fixed-length scan still pays for every step.
        # A trained model decodes near max length; threshold 1.0 makes the
        # measurement reflect that.
        "model.decoder.stop_threshold": 1.0,
    }
    if cfg_overrides:
        ov.update(cfg_overrides)
    if checkpoint_workdir is not None:
        # Trained-model bench (BASELINE "decode steps/sec" on a real model):
        # real stop-token termination instead of the forced full-length run.
        import os

        base = load_config(os.path.join(checkpoint_workdir, "config.json"))
        ov.pop("model.decoder.stop_threshold", None)
        cfg = apply_overrides(base, ov)
    else:
        cfg = apply_overrides(get_preset("gst_lj"), ov)

    rng = np.random.default_rng(0)
    # default batch 32 = the measured throughput optimum of the r4 sweep
    # (BENCH_r04_sweep.json: 4746 audio-s/s at B=32 vs 3995 at the old B=8;
    # B=64 regresses to 4608)
    t_text, t_mel, batch = 64, 128, (batch or 32)
    if checkpoint_workdir is not None:
        # real sentences, not random ids: stop-token timing on a trained
        # model only makes sense for text it was trained to speak
        from gst_tacotron_tpu.text import batch_text_to_ids

        sents = list(cfg.train.eval_sentences)
        texts = [sents[i % len(sents)] for i in range(batch)]
        tok, tok_len = batch_text_to_ids(texts)
        tokens = np.zeros((batch, t_text), np.int32)
        tokens[:, : min(t_text, tok.shape[1])] = tok[:, :t_text]
        token_lengths = np.minimum(tok_len, t_text).astype(np.int32)
    else:
        tokens = rng.integers(2, 40, (batch, t_text)).astype(np.int32)
        token_lengths = np.full((batch,), t_text, np.int32)
    sample = {
        "tokens": tokens,
        "token_lengths": token_lengths,
        "mel": rng.random((batch, t_mel, cfg.model.num_mels), np.float32),
        "mel_lengths": np.full((batch,), t_mel, np.int32),
        "linear": rng.random((batch, t_mel, cfg.model.num_freq), np.float32),
        "speaker_ids": np.zeros((batch,), np.int32),
    }
    # Init on the host CPU backend: param init runs a full teacher-forced
    # forward, which would be one huge throwaway compile on the TPU (and the
    # axon remote-compile path makes that minutes); transfer params after.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    t0 = time.perf_counter()
    if cpu is not None:
        with jax.default_device(cpu):
            model, state = init_state(cfg, jax.random.PRNGKey(0), sample)
    else:
        model, state = init_state(cfg, jax.random.PRNGKey(0), sample)
    # Keep the state on the HOST: holding the ~130-leaf state tree as live
    # device buffers degrades every subsequent call on this runtime (the
    # same 3-program pipeline measures 18ms with a lean session vs ~1s with
    # the tree resident). The benched programs receive params as ONE flat
    # buffer via FlatTree.
    state = jax.device_get(state)
    if checkpoint_workdir is not None:
        import os

        from gst_tacotron_tpu.checkpoint import CheckpointManager

        ckpt = CheckpointManager(
            os.path.join(checkpoint_workdir, cfg.train.checkpoint_dir))
        state = ckpt.restore(state)
        log(f"restored trained checkpoint at step {int(state.step)}")
    log(f"init done in {time.perf_counter() - t0:.1f}s")
    return cfg, model, state, sample


def bench_fused(cfg, model, state, sample, iterations=10):
    """Our path: one jitted program for decode + postnet + Griffin-Lim."""
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.dsp import JaxDSP

    from gst_tacotron_tpu.utils.flatten import FlatTree

    dsp = JaxDSP(cfg.audio)
    fp = FlatTree({"params": state.params, "batch_stats": state.batch_stats})

    @jax.jit
    def synth(acc, flat, tokens, token_lengths, ref_mel, ref_lengths, rng):
        variables = fp.unpack(flat)
        # production composition (Synthesizer._fast_style): style via the
        # fused/batched reference-encoder kernel, not the flax im2col stack
        style = None
        if cfg.model.gst.enabled and ref_mel is not None:
            from gst_tacotron_tpu.ops.refenc_pallas import (
                gst_style_from_params,
            )

            style, _ = gst_style_from_params(
                variables, cfg.model.gst, ref_mel, ref_lengths)
        out = model.apply(
            variables, tokens, token_lengths,
            ref_mel=ref_mel, ref_mel_lengths=ref_lengths,
            precomputed_style=style,
            method=model.infer, rngs={"dropout": rng},
        )
        wav = dsp.inv_linear_spectrogram(out["linear"])
        # tiny checksum output depending on the waveform: fetching it is the
        # reliable end-of-execution barrier, and CHAINING it through the next
        # call defeats the runtime's lazy execution (unfetched results may
        # simply never run — measured) and result caching
        checksum = jnp.sum(wav[:, :: 997]) + acc * 1e-9
        return wav, out["frame_lengths"], checksum

    args = (
        fp.flat,
        jnp.asarray(sample["tokens"]),
        jnp.asarray(sample["token_lengths"]),
        jnp.asarray(sample["mel"]),
        jnp.asarray(sample["mel_lengths"]),
        jax.random.PRNGKey(0),
    )
    t0 = time.perf_counter()
    wav, fl, csum = synth(jnp.float32(0.0), *args)
    _ = np.asarray(csum)  # compile + warmup
    log(f"fused synth compiled in {time.perf_counter() - t0:.1f}s")
    # Each timed iteration gets a fresh PRNG key (and therefore fresh prenet
    # dropout): identical (program, inputs) pairs can be served from caches
    # in the remote-execution path, which would fake the timing.
    # block_until_ready on the tunneled runtime has been observed to return
    # before execution completes; a host fetch of output data is the reliable
    # barrier. Queue all iterations, then fetch bytes from the LAST result.
    t0 = time.perf_counter()
    for i in range(iterations):
        wav, fl, csum = synth(csum, *args[:-1], jax.random.PRNGKey(100 + i))
    _ = np.asarray(csum)  # sync: the chain forces every execution
    dt = (time.perf_counter() - t0) / iterations
    log(f"fused synth steady-state: {dt*1e3:.1f} ms/batch (chain-synced)")

    frames = int(np.sum(np.asarray(fl)))
    audio_seconds = frames * cfg.audio.hop_length / cfg.audio.sample_rate
    decode_steps = frames // cfg.model.decoder.reduction_factor
    return audio_seconds, dt, decode_steps


def bench_fused_pallas(cfg, model, state, sample, iterations=10):
    """Fast path: encode program + fused whole-decode Pallas kernel +
    postnet/Griffin-Lim program (the Synthesizer use_pallas_decoder=True
    composition). Chained across iterations via a ref_mel perturbation."""
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.dsp import JaxDSP
    from gst_tacotron_tpu.ops.decode_pallas import (
        decode_scan_pallas, pack_decoder_weights,
    )

    from gst_tacotron_tpu.utils.flatten import FlatTree

    dsp = JaxDSP(cfg.audio)
    fp = FlatTree({"params": state.params, "batch_stats": state.batch_stats})
    steps = cfg.model.decoder.max_decode_steps

    @jax.jit
    def encode(flat, tokens, token_lengths, ref_mel, ref_lengths):
        variables = fp.unpack(flat)
        style = None
        if cfg.model.gst.enabled and ref_mel is not None:
            from gst_tacotron_tpu.ops.refenc_pallas import (
                gst_style_from_params,
            )

            style, _ = gst_style_from_params(
                variables, cfg.model.gst, ref_mel, ref_lengths)

        def fn(mdl):
            memory, _ = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_lengths, None, None,
                False, precomputed_style=style)
            keys = mdl.decoder.cell.precompute_keys(memory)
            return memory, keys
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    packed_fp = FlatTree(pack_decoder_weights(
        jax.device_get(state.params)["decoder"]["cell"],
        cfg.model.num_mels, cfg.model.decoder.reduction_factor,
        tuple(cfg.model.decoder.prenet_dims)))

    @jax.jit
    def decode(packed_flat, memory, keys, token_lengths):
        packed = packed_fp.unpack(packed_flat)
        mask = jnp.arange(memory.shape[1])[None, :] < token_lengths[:, None]
        return decode_scan_pallas(
            packed, memory, keys, mask,
            dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
            num_mels=cfg.model.num_mels, steps=steps, use_dropout=True)

    @jax.jit
    def finish(flat, mel):
        variables = fp.unpack(flat)
        linear = model.apply(
            variables, mel, None, train=False,
            method=lambda mdl, m, fl, train: mdl.postnet(m, fl, train=train))
        wav = dsp.inv_linear_spectrogram(linear)
        return jnp.sum(wav[:, ::997])

    tokens = jnp.asarray(sample["tokens"])
    token_lengths = jnp.asarray(sample["token_lengths"])
    ref_mel = jnp.asarray(sample["mel"])
    ref_lengths = jnp.asarray(sample["mel_lengths"])

    def pipeline(acc):
        memory, keys = encode(fp.flat, tokens, token_lengths,
                              ref_mel + acc * 1e-9, ref_lengths)
        mel, stops, aligns = decode(packed_fp.flat, memory, keys, token_lengths)
        return finish(fp.flat, mel)

    acc = pipeline(jnp.float32(0.0))
    _ = np.asarray(acc)  # compile all three programs
    log("pallas pipeline compiled")
    t0 = time.perf_counter()
    for _ in range(iterations):
        acc = pipeline(acc)
    _ = np.asarray(acc)
    dt = (time.perf_counter() - t0) / iterations
    log(f"pallas pipeline steady-state: {dt*1e3:.1f} ms/batch")

    frames = tokens.shape[0] * steps * cfg.model.decoder.reduction_factor
    audio_seconds = frames * cfg.audio.hop_length / cfg.audio.sample_rate
    decode_steps = frames // cfg.model.decoder.reduction_factor
    return audio_seconds, dt, decode_steps


def bench_fused_pallas_tiled(cfg, model, state, sample, iterations=10,
                             tile=8):
    """Pallas-decode pipeline at large batch via BATCH TILING: the decode
    mega-kernel is launched B//tile times over batch slices inside one jit,
    each launch at the proven tile=8 Mosaic shape (the monolithic B>=16
    kernel compile hangs the remote compiler — CLAUDE.md #8/#14; tiling
    sidesteps it because the kernel program is byte-identical to the B=8
    one, only the launch count changes). Weights are re-read per launch
    (~7 MB / 819 GB/s ~= 8.5 us — noise)."""
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.dsp import JaxDSP
    from gst_tacotron_tpu.ops.decode_pallas import (
        decode_scan_pallas, pack_decoder_weights,
    )
    from gst_tacotron_tpu.utils.flatten import FlatTree

    dsp = JaxDSP(cfg.audio)
    fp = FlatTree({"params": state.params, "batch_stats": state.batch_stats})
    steps = cfg.model.decoder.max_decode_steps
    b = sample["tokens"].shape[0]
    assert b % tile == 0, (b, tile)
    n_tiles = b // tile

    @jax.jit
    def encode(flat, tokens, token_lengths, ref_mel, ref_lengths):
        variables = fp.unpack(flat)
        style = None
        if cfg.model.gst.enabled and ref_mel is not None:
            from gst_tacotron_tpu.ops.refenc_pallas import (
                gst_style_from_params,
            )

            style, _ = gst_style_from_params(
                variables, cfg.model.gst, ref_mel, ref_lengths)

        def fn(mdl):
            memory, _ = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_lengths, None, None,
                False, precomputed_style=style)
            keys = mdl.decoder.cell.precompute_keys(memory)
            return memory, keys
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    packed_fp = FlatTree(pack_decoder_weights(
        jax.device_get(state.params)["decoder"]["cell"],
        cfg.model.num_mels, cfg.model.decoder.reduction_factor,
        tuple(cfg.model.decoder.prenet_dims)))

    @jax.jit
    def decode_tiled(packed_flat, memory, keys, token_lengths):
        packed = packed_fp.unpack(packed_flat)
        mask = jnp.arange(memory.shape[1])[None, :] < token_lengths[:, None]
        mels = []
        for k in range(n_tiles):
            sl = slice(k * tile, (k + 1) * tile)
            mel_k, _, _ = decode_scan_pallas(
                packed, memory[sl], keys[sl], mask[sl],
                dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
                num_mels=cfg.model.num_mels, steps=steps, use_dropout=True)
            mels.append(mel_k)
        return jnp.concatenate(mels, axis=0)

    @jax.jit
    def finish(flat, mel):
        variables = fp.unpack(flat)
        linear = model.apply(
            variables, mel, None, train=False,
            method=lambda mdl, m, fl, train: mdl.postnet(m, fl, train=train))
        wav = dsp.inv_linear_spectrogram(linear)
        return jnp.sum(wav[:, ::997])

    tokens = jnp.asarray(sample["tokens"])
    token_lengths = jnp.asarray(sample["token_lengths"])
    ref_mel = jnp.asarray(sample["mel"])
    ref_lengths = jnp.asarray(sample["mel_lengths"])

    def pipeline(acc):
        memory, keys = encode(fp.flat, tokens, token_lengths,
                              ref_mel + acc * 1e-9, ref_lengths)
        mel = decode_tiled(packed_fp.flat, memory, keys, token_lengths)
        return finish(fp.flat, mel)

    t0 = time.perf_counter()
    acc = pipeline(jnp.float32(0.0))
    _ = np.asarray(acc)
    log(f"tiled pallas pipeline (B={b}, {n_tiles}x{tile}) compiled in "
        f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iterations):
        acc = pipeline(acc)
    _ = np.asarray(acc)
    dt = (time.perf_counter() - t0) / iterations
    log(f"tiled pallas pipeline steady-state: {dt*1e3:.1f} ms/batch")

    frames = b * steps * cfg.model.decoder.reduction_factor
    audio_seconds = frames * cfg.audio.hop_length / cfg.audio.sample_rate
    decode_steps = frames // cfg.model.decoder.reduction_factor
    return audio_seconds, dt, decode_steps


def bench_config5(cfg, model, state, sample, iterations=5,
                  vocoder_workdir=None, tile=8):
    """Config-5 end-to-end throughput (BASELINE configs[5]): text -> encoder
    + GST -> fused Pallas decode -> WaveRNN Pallas sampler -> waveform,
    audio-s/s/chip.

    r5 (VERDICT r4 #6): decode batch is decoupled from the vocoder stream
    count. B > 8 launches the decode mega-kernel in 8-row tiles (same trick
    as bench_fused_pallas_tiled — the monolithic B>=16 Mosaic compile hangs
    the remote compiler, CLAUDE.md #14) while the WaveRNN sampler runs ALL
    B streams in one launch (measured near-flat per-stream cost:
    2.57 us/sample-step at 32 streams vs 2.13 at 4, KERNEL_BENCH_r04
    wavernn_scaling). vocoder_workdir restores trained WaveRNN weights
    (throughput-neutral, removes the 'untrained weights' annotation).

    Run LAST: the AR sampling program is large and this runtime degrades
    sessions that have executed huge programs (CLAUDE.md #10)."""
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.dsp.jax_dsp import mulaw_decode
    from gst_tacotron_tpu.models.wavernn import WaveRNN
    from gst_tacotron_tpu.ops.decode_pallas import (
        decode_scan_pallas, pack_decoder_weights,
    )
    from gst_tacotron_tpu.ops.wavernn_pallas import (
        pack_wavernn_weights, wavernn_sample_pallas,
    )
    from gst_tacotron_tpu.utils.flatten import FlatTree

    vcfg = cfg.model.vocoder
    assert vcfg.wavernn_hop == cfg.audio.hop_length
    wmodel = WaveRNN(vcfg, cfg.model.num_mels)
    steps = cfg.model.decoder.max_decode_steps
    r = cfg.model.decoder.reduction_factor
    b = sample["tokens"].shape[0]
    assert b <= tile or b % tile == 0, (b, tile)
    n_tiles = max(1, b // tile) if b > tile else 1

    # init WaveRNN on the host CPU backend (same reasoning as build())
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    hop = vcfg.wavernn_hop
    trained_vocoder = False
    if vocoder_workdir:
        from gst_tacotron_tpu.vocoder import load_wavernn_variables

        wvars = jax.device_get(load_wavernn_variables(cfg, vocoder_workdir))
        trained_vocoder = True
        log(f"config5: restored trained WaveRNN from {vocoder_workdir}")
    else:
        with jax.default_device(cpu) if cpu is not None else _nullcontext():
            wvars = jax.device_get(wmodel.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 2, cfg.model.num_mels), jnp.float32),
                jnp.zeros((1, 2 * hop), jnp.float32),
            ))
    w_fp = FlatTree(wvars)
    packed_w_fp = FlatTree(pack_wavernn_weights(wvars["params"], vcfg))

    fp = FlatTree({"params": state.params, "batch_stats": state.batch_stats})
    packed_fp = FlatTree(pack_decoder_weights(
        jax.device_get(state.params)["decoder"]["cell"],
        cfg.model.num_mels, r, tuple(cfg.model.decoder.prenet_dims)))

    @jax.jit
    def encode(flat, tokens, token_lengths, ref_mel, ref_lengths):
        variables = fp.unpack(flat)
        style = None
        if cfg.model.gst.enabled:
            from gst_tacotron_tpu.ops.refenc_pallas import (
                gst_style_from_params,
            )

            style, _ = gst_style_from_params(
                variables, cfg.model.gst, ref_mel, ref_lengths)

        def fn(mdl):
            memory, _ = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_lengths, None, None,
                False, precomputed_style=style)
            keys = mdl.decoder.cell.precompute_keys(memory)
            return memory, keys
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    @jax.jit
    def decode(packed_flat, memory, keys, token_lengths):
        packed = packed_fp.unpack(packed_flat)
        mask = jnp.arange(memory.shape[1])[None, :] < token_lengths[:, None]
        if b <= tile:
            mel, _, _ = decode_scan_pallas(
                packed, memory, keys, mask,
                dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
                num_mels=cfg.model.num_mels, steps=steps, use_dropout=True)
            return mel
        mels = []
        for k in range(n_tiles):
            sl = slice(k * tile, (k + 1) * tile)
            mel_k, _, _ = decode_scan_pallas(
                packed, memory[sl], keys[sl], mask[sl],
                dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
                num_mels=cfg.model.num_mels, steps=steps, use_dropout=True)
            mels.append(mel_k)
        return jnp.concatenate(mels, axis=0)

    @jax.jit
    def vocode(wflat, packed_wflat, mel, seed):
        variables = w_fp.unpack(wflat)
        packed = packed_w_fp.unpack(packed_wflat)
        cond = wmodel.apply(variables, mel, method=wmodel.upsample_cond)
        classes = wavernn_sample_pallas(packed, cond, cfg=vcfg, seed=seed)
        wav = mulaw_decode(classes, vcfg.wavernn_bits)
        return jnp.sum(wav[:, ::997])

    tokens = jnp.asarray(sample["tokens"])
    token_lengths = jnp.asarray(sample["token_lengths"])
    ref_mel = jnp.asarray(sample["mel"])
    ref_lengths = jnp.asarray(sample["mel_lengths"])

    def pipeline(acc, seed):
        memory, keys = encode(fp.flat, tokens, token_lengths,
                              ref_mel + acc * 1e-9, ref_lengths)
        mel = decode(packed_fp.flat, memory, keys, token_lengths)
        return vocode(w_fp.flat, packed_w_fp.flat, mel, seed)

    t0 = time.perf_counter()
    acc = pipeline(jnp.float32(0.0), jnp.int32(7))
    _ = np.asarray(acc)
    log(f"config5 pipeline compiled in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(iterations):
        acc = pipeline(acc, jnp.int32(100 + i))
    _ = np.asarray(acc)
    dt = (time.perf_counter() - t0) / iterations
    frames = b * steps * r
    audio_seconds = frames * cfg.audio.hop_length / cfg.audio.sample_rate
    samples = frames * hop
    log(f"config5 (WaveRNN) steady-state: {dt*1e3:.1f} ms/batch, "
        f"{audio_seconds/dt:.1f} audio-s/s")
    return {
        "audio_seconds_per_sec_per_chip": audio_seconds / dt,
        "wall_s_per_batch": dt,
        "batch": b,
        "decode_tiles": n_tiles if b > tile else 1,
        "vocoder_streams": b,
        "mel_frames_per_utt": steps * r,
        "wav_samples_per_batch": samples,
        "samples_per_sec": samples / dt,
        "realtime_factor_aggregate": audio_seconds / dt,
        "vocoder": "wavernn_pallas (512-GRU, mu-law 8-bit)"
                   + (" — TRAINED 20k checkpoint" if trained_vocoder
                      else " — untrained weights"),
        "note": "throughput basis identical to the Griffin-Lim headline "
                "(full fixed-length decode); decode batch tiled 8-wide, "
                "vocoder samples all streams in one launch",
    }


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def bench_reference_style(cfg, model, state, sample, max_steps=40):
    """Reference-architecture emulation: per-step host dispatch + host GL.

    One jitted single-decoder-step program invoked from a Python loop (the
    reference's tf.function-per-step pattern) + numpy Griffin-Lim. Measured at
    `max_steps` and linearly extrapolated to the fused run's step count (the
    per-step cost is constant).
    """
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.dsp import ref as dsp_ref

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tokens = jnp.asarray(sample["tokens"])
    token_lengths = jnp.asarray(sample["token_lengths"])
    ref_mel = jnp.asarray(sample["mel"])
    ref_lengths = jnp.asarray(sample["mel_lengths"])

    # Precompute memory once (the reference does this too).
    @jax.jit
    def encode(variables, tokens, token_lengths, ref_mel, ref_lengths):
        def fn(mdl):
            memory, _ = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_lengths, None, None, False
            )
            keys = mdl.decoder.cell.precompute_keys(memory)
            return memory, keys
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    memory, keys = jax.tree_util.tree_map(
        jax.block_until_ready, encode(variables, tokens, token_lengths,
                                      ref_mel, ref_lengths)
    )

    from gst_tacotron_tpu.models.modules import length_mask

    mask = length_mask(token_lengths, memory.shape[1])

    @jax.jit
    def one_step(variables, carry, memory, keys, mask, rng):
        def fn(mdl):
            return mdl.decoder.cell(carry, None, memory, keys, mask)
        return model.apply(variables, method=fn, rngs={"dropout": rng})

    @jax.jit
    def init_carry(memory):
        def fn(mdl):
            b = memory.shape[0]
            go = jnp.zeros((b, cfg.model.num_mels), jnp.float32)
            return mdl.decoder.cell.init_carry(b, memory.shape[1], go)
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    carry = init_carry(memory)
    # warmup/compile
    t0 = time.perf_counter()
    carry2, _ = one_step(variables, carry, memory, keys, mask,
                         jax.random.PRNGKey(1))
    jax.block_until_ready(carry2["attn_rnn_h"])
    log(f"per-step program compiled in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    c = carry
    outs = []
    for i in range(max_steps):
        c, (frames, stops, align) = one_step(
            variables, c, memory, keys, mask, jax.random.PRNGKey(i)
        )
        # the reference materializes each step's output on host
        outs.append(np.asarray(frames))
    decode_dt = time.perf_counter() - t0
    per_step = decode_dt / max_steps

    # Host Griffin-Lim on a short spectrogram, extrapolated per-frame.
    gl_frames = 64
    mag = np.abs(np.random.default_rng(0).standard_normal(
        (gl_frames, cfg.model.num_freq)
    )).astype(np.float64)
    gl_cfg = cfg.audio
    t0 = time.perf_counter()
    dsp_ref.griffin_lim(mag, gl_cfg)
    gl_dt = time.perf_counter() - t0
    gl_per_frame = gl_dt / gl_frames

    return per_step, gl_per_frame


def bench_train(transport: str, steps: int = 15, batch: int = 8):
    """Train-step throughput on the real chip, per batch transport.

    Measures the donated-state train step fed FRESH host batches each
    iteration — the real training pattern: the loader hands numpy arrays, so
    each step pays host->device upload plus per-argument-buffer dispatch
    (the dominant costs on this runtime, CLAUDE.md #10). transport
    "features": the standard 6-tensor f32 feature batch; "wav": the 2-buffer
    f16+int32 wire format with on-device feature extraction
    (train._materialize_features).
    """
    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.config import apply_overrides, get_preset
    from gst_tacotron_tpu.train import (
        init_state, make_corpus_train_step, make_optimizer, make_train_step,
    )

    cfg = apply_overrides(get_preset("gst_lj"), {
        "data.wav_transport": transport in ("wav", "corpus"),
        "data.batch_size": batch,
    })
    rng = np.random.default_rng(0)
    t_text, t_mel = 64, 400
    a = cfg.audio
    feat = {
        "tokens": rng.integers(2, 40, (batch, t_text)).astype(np.int32),
        "token_lengths": np.full((batch,), t_text, np.int32),
        "mel": rng.random((batch, t_mel, cfg.model.num_mels), np.float32),
        "mel_lengths": np.full((batch,), t_mel, np.int32),
        "linear": rng.random((batch, t_mel, cfg.model.num_freq), np.float32),
        "speaker_ids": np.zeros((batch,), np.int32),
    }
    if transport in ("wav", "corpus"):
        sig_len = (t_mel - 1) * a.hop_length + a.n_fft
        ints = np.zeros((batch, t_text + 4), np.int32)
        ints[:, :t_text] = feat["tokens"]
        ints[:, t_text] = t_text
        ints[:, t_text + 1] = t_mel
        ints[:, t_text + 2] = t_mel
        wire = {
            "wav": (rng.standard_normal((batch, sig_len)) * 0.05
                    ).astype(np.float16),
            "ints": ints,
        }
    else:
        wire = feat
    bytes_per_batch = sum(v.nbytes for v in wire.values())
    if transport == "corpus":
        # device-resident corpus mode: the per-step wire is a (B,) index
        bytes_per_batch = batch * 4

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            model, state = init_state(cfg, jax.random.PRNGKey(0), feat)
    else:
        model, state = init_state(cfg, jax.random.PRNGKey(0), feat)
    tx = make_optimizer(cfg.optimizer)
    state = jax.device_put(state)
    if transport == "corpus":
        # 64-row resident corpus at the batch's shapes; fresh idx per step
        n_rows = 64
        c_wav = jax.device_put(np.concatenate(
            [wire["wav"]] * (n_rows // batch), axis=0))
        c_ints = jax.device_put(np.concatenate(
            [wire["ints"]] * (n_rows // batch), axis=0))
        jax.block_until_ready(c_wav)
        step_fn = make_corpus_train_step(
            model, tx, cfg, t_text, wire["wav"].shape[1], t_text)
        t0 = time.perf_counter()
        state, metrics = step_fn(
            state, c_wav, c_ints, np.arange(batch, dtype=np.int32))
        _ = float(metrics["loss"])
        log(f"train[{transport}] compiled in {time.perf_counter() - t0:.1f}s")
        idxs = [rng.integers(0, n_rows, batch).astype(np.int32)
                for _ in range(steps)]
        t0 = time.perf_counter()
        for idx in idxs:
            state, metrics = step_fn(state, c_wav, c_ints, idx)
        loss = float(metrics["loss"])  # barrier: every step feeds the next
        dt = (time.perf_counter() - t0) / steps
        log(f"train[{transport}]: {dt*1e3:.1f} ms/step, loss {loss:.4f}")
        return {
            "transport": transport,
            "ms_per_step": round(dt * 1e3, 2),
            "steps_per_sec": round(1.0 / dt, 3),
            "wire_mb_per_batch": round(bytes_per_batch / 1e6, 6),
            "arg_buffers": 1,
            "batch": batch,
            "t_mel_frames": t_mel,
        }
    step_fn = make_train_step(model, tx, cfg)  # donated state chain
    t0 = time.perf_counter()
    state, metrics = step_fn(state, wire)
    _ = float(metrics["loss"])  # forces compile + first step
    log(f"train[{transport}] compiled in {time.perf_counter() - t0:.1f}s")

    # Fresh host arrays each step (reusing resident device batches would skip
    # the upload being measured); one element perturbed per copy so no cache
    # layer can serve a repeat (program, inputs) pair.
    batches = []
    for i in range(steps):
        b = {k: v.copy() for k, v in wire.items()}
        (b["wav"] if "wav" in b else b["mel"])[0, 0] = i * 1e-3
        batches.append(b)
    t0 = time.perf_counter()
    for b in batches:
        state, metrics = step_fn(state, b)
    loss = float(metrics["loss"])  # barrier: every step feeds the next
    dt = (time.perf_counter() - t0) / steps
    log(f"train[{transport}]: {dt*1e3:.1f} ms/step, "
        f"{bytes_per_batch/1e6:.2f} MB/batch wire, loss {loss:.4f}")
    return {
        "transport": transport,
        "ms_per_step": round(dt * 1e3, 2),
        "steps_per_sec": round(1.0 / dt, 3),
        "wire_mb_per_batch": round(bytes_per_batch / 1e6, 3),
        "arg_buffers": len(wire),
        "batch": batch,
        "t_mel_frames": t_mel,
    }


def bench_scaling_child(n_devices: int, steps: int = 10) -> None:
    """Child process: sharded GST train-step throughput on an n-device fake
    CPU mesh, fixed per-device batch (weak scaling). Prints one JSON line."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gst_tacotron_tpu.config import apply_overrides, get_preset
    from gst_tacotron_tpu.parallel import make_mesh, shard_batch, shard_params
    from gst_tacotron_tpu.train import init_state, make_optimizer, make_train_step

    import __graft_entry__ as graft

    cfg = apply_overrides(get_preset("gst_lj"), graft._tiny_overrides())
    cfg = apply_overrides(cfg, {"data.batch_size": 2 * n_devices})
    batch = graft._make_batch(cfg, batch=2 * n_devices)
    mesh = make_mesh(1, devices=jax.devices()[:n_devices])

    model, state = init_state(cfg, jax.random.PRNGKey(0), batch)
    state = state.replace(params=shard_params(state.params, mesh))
    tx = make_optimizer(cfg.optimizer)
    step_fn = make_train_step(model, tx, cfg, mesh, donate=False)

    import jax.numpy as jnp

    db = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    state, metrics = step_fn(state, db)  # compile
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, db)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    row = {
        "devices": n_devices,
        "steps_per_sec": 1.0 / dt,
        "global_samples_per_sec": (2 * n_devices) / dt,
    }

    # -- contention control: a trivial sharded program (no collectives, no
    # model) with the same per-device work at every N. Its falloff bounds the
    # host-core-contention term of the curve; anything beyond it in the other
    # workloads is real sharding/collective overhead. (VERDICT r2 weak item.)
    from gst_tacotron_tpu.parallel import data_sharding

    ctl = jax.device_put(
        jnp.ones((n_devices * 64, 512), jnp.float32), data_sharding(mesh))

    @jax.jit
    def control(x):
        for _ in range(30):
            x = jnp.tanh(x) * 1.0001 + 0.0001
        return x

    ctl_out = control(ctl)
    jax.block_until_ready(ctl_out)
    t0 = time.perf_counter()
    for _ in range(steps):
        ctl_out = control(ctl_out)
    jax.block_until_ready(ctl_out)
    dt_ctl = (time.perf_counter() - t0) / steps
    row["control_global_rows_per_sec"] = (n_devices * 64) / dt_ctl

    # -- chunked-consensus distributed synthesis (BASELINE-named path) -------
    from gst_tacotron_tpu.parallel.distributed_synthesis import (
        DistributedSynthesizer,
    )

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    ds = DistributedSynthesizer(cfg, model, variables, mesh)
    bsy = 2 * n_devices
    tokens = np.tile(batch["tokens"][:1], (bsy, 1))
    tok_len = np.tile(batch["token_lengths"][:1], (bsy,))
    w = np.full((bsy, cfg.model.gst.num_tokens),
                1.0 / cfg.model.gst.num_tokens, np.float32)
    syn_steps = 8

    def run_synth():
        out = ds(tokens, tok_len, token_weights=w, chunked=True,
                 chunk_steps=4, max_steps=syn_steps)
        jax.block_until_ready(out["mel"])
        return out

    run_synth()  # compile
    t0 = time.perf_counter()
    iters = max(3, steps // 2)
    for _ in range(iters):
        out = run_synth()
    dt_syn = (time.perf_counter() - t0) / iters
    r = cfg.model.decoder.reduction_factor
    row["synth_global_frames_per_sec"] = (
        bsy * syn_steps * r / dt_syn)

    # -- sharded WaveRNN sampling (BASELINE-named path) -----------------------
    from gst_tacotron_tpu.config import VocoderConfig
    from gst_tacotron_tpu.models.wavernn import WaveRNN

    vcfg = VocoderConfig(wavernn_gru_dim=16, wavernn_fc_dim=16, wavernn_hop=4)
    wmodel = WaveRNN(vcfg, cfg.model.num_mels)
    rng = np.random.default_rng(0)
    mel_w = jnp.asarray(
        rng.random((bsy, 6, cfg.model.num_mels)), jnp.float32)
    wvars = wmodel.init(jax.random.PRNGKey(0), mel_w,
                        jnp.zeros((bsy, 6 * vcfg.wavernn_hop)))
    wparams = shard_params(wvars["params"], mesh)
    mel_ws = jax.device_put(mel_w, data_sharding(mesh))

    @jax.jit
    def wsample(params, mel, key):
        return wmodel.apply({"params": params}, mel, key,
                            method=wmodel.sample)

    wout = wsample(wparams, mel_ws, jax.random.PRNGKey(3))
    jax.block_until_ready(wout)
    t0 = time.perf_counter()
    for _ in range(iters):
        wout = wsample(wparams, mel_ws, jax.random.PRNGKey(3))
    jax.block_until_ready(wout)
    dt_w = (time.perf_counter() - t0) / iters
    row["wavernn_global_samples_per_sec"] = bsy * 6 * vcfg.wavernn_hop / dt_w

    print(json.dumps(row))


def bench_scaling(device_counts=(1, 2, 4, 8)):
    """Fan out child processes with forced host device counts; normalize the
    weak-scaling efficiency curve (BASELINE 'scaling efficiency ... 1 chip /
    1 host / N hosts' — the cells this single-chip sandbox can fill; the
    absolute CPU numbers are meaningless, the curve shape is the data)."""
    import os
    import subprocess

    rows = []
    for n in device_counts:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(n)],
            capture_output=True, text=True, env=env, timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if not line:
            log(f"scaling child n={n} failed: {out.stderr[-500:]}")
            continue
        rows.append(json.loads(line))
        log(f"scaling n={n}: {rows[-1]['global_samples_per_sec']:.2f} samples/s")
    if rows:
        # per-workload weak-scaling efficiency, each normalized to its own
        # 1-device per-device rate
        for key, eff in (
            ("global_samples_per_sec", "weak_scaling_efficiency"),
            ("control_global_rows_per_sec", "control_efficiency"),
            ("synth_global_frames_per_sec", "synth_efficiency"),
            ("wavernn_global_samples_per_sec", "wavernn_efficiency"),
        ):
            if key not in rows[0]:
                continue
            base = rows[0][key] / rows[0]["devices"]
            for r in rows:
                if key in r:
                    r[eff] = round(r[key] / r["devices"] / base, 3)
    return rows


def _arm_watchdog(seconds: float):
    """If the TPU tunnel is wedged (observed: relay process dies and every
    device call blocks forever), emit an HONEST failure line instead of
    hanging past the driver's patience. Normal full runs finish in ~6-8 min
    incl. first compile; the default budget is far above that."""
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "audio_seconds_per_sec_per_chip",
            "value": 0.0,
            "unit": "audio-s/s/chip",
            "vs_baseline": 0.0,
            "error": f"watchdog: no result within {seconds:.0f}s — device "
                     "tunnel unresponsive; see BENCH_trained_r02.json for "
                     "the last committed measurement",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="smaller workload")
    p.add_argument("--watchdog", type=float, default=2400.0,
                   help="seconds before an unresponsive-device failure line "
                        "is emitted (0 disables)")
    p.add_argument("--details", help="write detailed JSON here")
    p.add_argument("--batch", type=int,
                   help="synthesis batch size (default: the measured "
                        "optimum; see BENCH_r04_sweep.json)")
    p.add_argument("--no-pallas-pipeline", action="store_true",
                   help="skip the Pallas-decode pipeline and bench only the "
                        "monolithic XLA program. Required for batch-size "
                        "sweeps at B>8: the Mosaic compile of the fused "
                        "decode kernel at B=16 hung the remote compiler "
                        ">30 min and wedged the device for over an hour "
                        "(observed 2026-08-20)")
    p.add_argument("--checkpoint",
                   help="training workdir: bench the TRAINED model with real "
                        "stop-token termination (BASELINE decode-steps/sec)")
    p.add_argument("--config5", action="store_true",
                   help="also measure the config-5 neural-vocoder pipeline "
                        "(text -> mel -> WaveRNN Pallas sampler -> wav) "
                        "end to end; written to --details. Batch must be "
                        "<= 8 or a multiple of 8 (decode tiles 8-wide)")
    p.add_argument("--vocoder-workdir",
                   help="vocoder_train workdir with vocoder_ckpt/ — config5 "
                        "then runs the TRAINED WaveRNN weights")
    p.add_argument("--scaling", action="store_true",
                   help="also measure the 1/2/4/8-device weak-scaling curve "
                        "on a fake CPU mesh (written to --details)")
    p.add_argument("--scaling-child", type=int, help=argparse.SUPPRESS)
    p.add_argument("--train-bench", action="store_true",
                   help="train-step throughput, feature- vs wav-transport "
                        "(prints one JSON line; exclusive mode)")
    args = p.parse_args()

    # ADVICE r4: validate --batch before any device work. The batch-tiled
    # Pallas decode pipeline launches the proven B=8 Mosaic kernel in 8-row
    # tiles, so B>8 must be a multiple of 8; anything else falls back to the
    # monolithic XLA program instead of dying mid-run on an AssertionError.
    if args.batch is not None:
        if args.batch < 1:
            p.error(f"--batch {args.batch}: must be >= 1")
        if args.batch > 8 and args.batch % 8 != 0 \
                and not args.no_pallas_pipeline:
            log(f"--batch {args.batch} is not a multiple of 8; the tiled "
                "Pallas decode pipeline needs 8-row tiles — benching the "
                "monolithic XLA program only")
            args.no_pallas_pipeline = True

    if args.scaling_child:
        bench_scaling_child(args.scaling_child)
        return

    if args.train_bench:
        _enable_compile_cache()
        rows = [bench_train("features"), bench_train("wav"),
                bench_train("corpus")]
        out = {
            "metric": "train_ms_per_step",
            "value": rows[1]["ms_per_step"],
            "unit": "ms/step (wav transport)",
            "vs_baseline": round(
                rows[0]["ms_per_step"] / rows[1]["ms_per_step"], 2),
            "rows": rows,
        }
        if args.details:
            with open(args.details, "w") as f:
                json.dump(out, f, indent=2)
        print(json.dumps(out))
        return

    watchdog = None
    if args.watchdog > 0:
        watchdog = _arm_watchdog(args.watchdog)

    overrides = None
    if args.quick:
        overrides = {"model.decoder.max_decode_steps": 50,
                     "audio.griffin_lim_iters": 8}

    _enable_compile_cache()

    import jax

    cfg, model, state, sample = build(overrides, args.checkpoint, args.batch)
    num_chips = jax.local_device_count()

    # Measure the headline (pallas pipeline) FIRST: running the huge
    # monolithic XLA program beforehand degrades subsequent calls in this
    # runtime session (measured: same pipeline 18ms fresh vs ~1s after).
    pallas_tput = None
    pallas_result = None
    if (cfg.model.attention.kind == "bahdanau" and args.checkpoint is None
            and not args.no_pallas_pipeline):
        try:
            if sample["tokens"].shape[0] <= 8:
                pa_audio, pa_dt, pa_steps = bench_fused_pallas(
                    cfg, model, state, sample)
            else:
                # B>8: the MONOLITHIC kernel compile at B=16 hung the remote
                # compiler and wedged the device ~90 min (2026-08-20); the
                # batch-TILED pipeline launches the proven B=8 kernel
                # B//8 times instead (same Mosaic program, safe compile)
                pa_audio, pa_dt, pa_steps = bench_fused_pallas_tiled(
                    cfg, model, state, sample)
            pallas_tput = pa_audio / pa_dt / num_chips
            pallas_result = (pa_audio, pa_dt, pa_steps)
        except Exception as e:
            log(f"pallas pipeline failed, using XLA path: {e}")

    audio_seconds, fused_dt, decode_steps = bench_fused(cfg, model, state, sample)
    fused_tput = audio_seconds / fused_dt / num_chips
    if pallas_tput is not None and pallas_tput > fused_tput:
        audio_seconds, fused_dt, decode_steps = pallas_result
        fused_tput = pallas_tput

    per_step, gl_per_frame = bench_reference_style(
        cfg, model, state, sample, max_steps=20 if args.quick else 40
    )
    frames = decode_steps * cfg.model.decoder.reduction_factor
    # The measured per-step cost on a TUNNELED device includes ~10-100ms of
    # relay RTT the reference would not pay on local hardware. To keep
    # vs_baseline conservative (favoring the baseline), cap the per-step
    # dispatch at a 2ms local-eager-dispatch estimate; the raw measurement is
    # in the details file.
    per_step_used = min(per_step, 0.002)
    ref_dt = per_step_used * decode_steps + gl_per_frame * frames
    ref_tput = audio_seconds / ref_dt / num_chips

    result = {
        "metric": "audio_seconds_per_sec_per_chip",
        "value": round(fused_tput, 3),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(fused_tput / ref_tput, 2),
    }
    details = {
        **result,
        "decode_steps_per_sec": decode_steps / fused_dt,
        "fused_wall_s": fused_dt,
        "pallas_pipeline_tput": pallas_tput,
        "emulated_reference_wall_s": ref_dt,
        "emulated_reference_tput": ref_tput,
        "per_step_dispatch_s": per_step,
        "per_step_dispatch_used_s": per_step_used,
        "gl_host_s_per_frame": gl_per_frame,
        "audio_seconds": audio_seconds,
        "synthesis_batch": sample["tokens"].shape[0],
        "num_chips": num_chips,
        "device": str(jax.devices()[0]),
        "baseline_note": (
            "reference TF2 repo publishes no numbers and no checkout exists; "
            "baseline is the reference ARCHITECTURE (per-step host dispatch + "
            "host Griffin-Lim) emulated with identical weights on the same "
            "device — see bench.py docstring"
        ),
    }
    if args.checkpoint:
        details["trained_checkpoint"] = {
            "workdir": args.checkpoint,
            "step": int(state.step),
            "stop_threshold": cfg.model.decoder.stop_threshold,
            "note": "real stop-token termination; audio_seconds reflects "
                    "per-utterance stopping, not forced full-length decode",
        }
    if args.config5:
        b5 = sample["tokens"].shape[0]
        if b5 > 8 and b5 % 8 != 0:
            details["config5_wavernn_pipeline"] = {
                "error": f"config5 needs --batch <= 8 or a multiple of 8 "
                         f"(got {b5}); decode launches the proven B=8 "
                         "Mosaic kernel in 8-row tiles"}
            log("config5 bench skipped: batch must be <=8 or 8-multiple")
        else:
            try:
                details["config5_wavernn_pipeline"] = bench_config5(
                    cfg, model, state, sample,
                    vocoder_workdir=args.vocoder_workdir)
            except Exception as e:
                details["config5_wavernn_pipeline"] = {"error": str(e)}
                log(f"config5 bench failed: {e}")
    if args.scaling:
        details["weak_scaling_fake_cpu_mesh"] = bench_scaling()
        details["scaling_note"] = (
            "weak scaling (fixed per-device batch) of the sharded GST train "
            "step on an N-virtual-device CPU mesh; absolute numbers are "
            "CPU-bound, the efficiency column is the datum. Real multi-host "
            "recipe: parallel/mesh.initialize_distributed + train "
            "--model-parallelism on a pod slice."
        )
    if args.details:
        with open(args.details, "w") as f:
            json.dump(details, f, indent=2)
    if watchdog is not None:
        watchdog.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
