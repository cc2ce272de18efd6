"""TPU kernel microbenchmarks: fused decode kernel vs XLA scan, Pallas STFT,
reference-encoder conv stack (the three named speed-of-light targets,
BASELINE.json:5). Run on the TPU host:

    PYTHONPATH=. python tools/tpu_kernel_bench.py [--steps 200] [--out file]

Writes one JSON report; progress lines on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print("[kbench]", *a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", default="/dev/stdout")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.config import apply_overrides, get_preset
    from gst_tacotron_tpu.models.decoder import Decoder
    from gst_tacotron_tpu.models.gst import ReferenceEncoder
    from gst_tacotron_tpu.ops.decode_pallas import (
        decode_scan_pallas, pack_decoder_weights,
    )
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas
    from gst_tacotron_tpu.train import init_state

    cfg = apply_overrides(get_preset("gst_lj"), {
        "model.decoder.max_decode_steps": args.steps,
        "model.decoder.stop_threshold": 1.0,
    })
    report = {"device": str(jax.devices()[0]), "steps": args.steps,
              "batch": args.batch}

    rng = np.random.default_rng(0)
    t_text, t_mel, b = 64, 128, args.batch
    sample = {
        "tokens": rng.integers(2, 40, (b, t_text)).astype(np.int32),
        "token_lengths": np.full((b,), t_text, np.int32),
        "mel": rng.random((b, t_mel, cfg.model.num_mels), np.float32),
        "mel_lengths": np.full((b,), t_mel, np.int32),
        "linear": rng.random((b, t_mel, cfg.model.num_freq), np.float32),
        "speaker_ids": np.zeros((b,), np.int32),
    }
    from gst_tacotron_tpu.utils.flatten import FlatTree

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, state = init_state(cfg, jax.random.PRNGKey(0), sample)
    state = jax.device_get(state)  # lean session: no resident buffer tree
    log("init done")

    fp = FlatTree({"params": state.params, "batch_stats": state.batch_stats})

    # ---- build memory/keys once -------------------------------------------
    @jax.jit
    def encode(flat, tokens, token_lengths, ref_mel, ref_lengths):
        variables = fp.unpack(flat)

        def fn(mdl):
            memory, _ = mdl._build_memory(
                tokens, token_lengths, ref_mel, ref_lengths, None, None, False)
            keys = mdl.decoder.cell.precompute_keys(memory)
            return memory, keys
        return model.apply(variables, method=fn,
                           rngs={"dropout": jax.random.PRNGKey(0)})

    memory, keys = encode(
        fp.flat, jnp.asarray(sample["tokens"]),
        jnp.asarray(sample["token_lengths"]), jnp.asarray(sample["mel"]),
        jnp.asarray(sample["mel_lengths"]))
    _ = np.asarray(jax.jit(lambda m: jnp.sum(m, axis=(1, 2)))(memory))
    log("encode done", memory.shape)
    mask = jnp.arange(memory.shape[1])[None, :] < jnp.asarray(
        sample["token_lengths"])[:, None]

    def timed(fn, args2, iters=20, name=""):
        """Chained timing: each call consumes the previous checksum, so the
        final fetch forces EVERY execution (the runtime is lazy — unfetched
        results may never execute)."""
        acc = fn(jnp.float32(0.0), *args2)
        _ = np.asarray(acc)  # compile+run
        t0 = time.perf_counter()
        for i in range(iters):
            acc = fn(acc, *args2)
        _ = np.asarray(acc)
        dt = (time.perf_counter() - t0) / iters
        log(f"{name}: {dt*1e3:.3f} ms")
        return dt

    # ---- XLA scan decoder --------------------------------------------------


    @jax.jit
    def scan_decode(acc, flat, memory, lengths, rng_key):
        variables = fp.unpack(flat)

        def fn(mdl):
            mel, stops, aligns, fl = mdl.decoder.decode(
                memory, lengths, deterministic_prenet=True)
            return jnp.sum(mel[:, ::7, 0])
        return acc * 1e-9 + model.apply(variables, method=fn,
                                        rngs={"dropout": rng_key})

    dt_scan = timed(
        scan_decode,
        (fp.flat, memory, jnp.asarray(sample["token_lengths"]),
         jax.random.PRNGKey(0)),
        iters=10, name="xla scan decode")
    report["xla_scan_decode_ms"] = dt_scan * 1e3
    report["xla_scan_us_per_step"] = dt_scan / args.steps * 1e6

    # ---- fused pallas decode ----------------------------------------------
    packed_fp = FlatTree(pack_decoder_weights(
        state.params["decoder"]["cell"],
        cfg.model.num_mels, cfg.model.decoder.reduction_factor,
        tuple(cfg.model.decoder.prenet_dims)))

    @jax.jit
    def pallas_decode(acc, packed_flat, memory, keys, mask):
        packed = packed_fp.unpack(packed_flat)
        mel, stops, aligns = decode_scan_pallas(
            packed, memory, keys, mask,
            dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
            num_mels=cfg.model.num_mels, steps=args.steps,
            use_dropout=False)
        return acc * 1e-9 + jnp.sum(mel[:, ::7, 0])

    dt_pal = timed(pallas_decode, (packed_fp.flat, memory, keys, mask),
                   iters=10, name="pallas fused decode")
    report["pallas_decode_ms"] = dt_pal * 1e3
    report["pallas_us_per_step"] = dt_pal / args.steps * 1e6
    report["decode_speedup"] = dt_scan / dt_pal

    # parity on TPU
    @jax.jit
    def both(packed_flat, memory, keys, mask, flat, lengths, rng_key):
        packed = packed_fp.unpack(packed_flat)
        variables = fp.unpack(flat)

        def fn(mdl):
            mel, stops, aligns, fl = mdl.decoder.decode(
                memory, lengths, deterministic_prenet=True)
            return mel
        mel_ref = model.apply(variables, method=fn, rngs={"dropout": rng_key})
        mel_k, _, _ = decode_scan_pallas(
            packed, memory, keys, mask,
            dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
            num_mels=cfg.model.num_mels, steps=args.steps, use_dropout=False)
        return jnp.max(jnp.abs(mel_ref - mel_k))

    err = float(np.asarray(both(
        packed_fp.flat, memory, keys, mask, fp.flat,
        jnp.asarray(sample["token_lengths"]), jax.random.PRNGKey(0))))
    report["decode_parity_max_err"] = err
    log("decode parity max err:", err)

    # ---- pallas STFT -------------------------------------------------------
    frames = jnp.asarray(rng.standard_normal((1024, cfg.audio.n_fft)),
                         jnp.float32)

    @jax.jit
    def stft(acc, fr):
        mel, lin = stft_features_pallas(fr, cfg.audio)
        return acc * 1e-9 + jnp.sum(mel[:, 0])

    dt_stft = timed(stft, (frames,), iters=20, name="pallas stft (1024 fr)")
    n_freq_pad = 1152
    flops = 2 * 1024 * cfg.audio.n_fft * n_freq_pad * 2 \
        + 2 * 1024 * n_freq_pad * 128
    report["pallas_stft_ms_1024frames"] = dt_stft * 1e3
    report["pallas_stft_tflops"] = flops / dt_stft / 1e12

    # ---- reference-encoder conv stack -------------------------------------
    refenc = ReferenceEncoder(cfg.model.gst, cfg.model.num_mels)
    mel_in = jnp.asarray(rng.random((8, 256, cfg.model.num_mels)), jnp.float32)
    with jax.default_device(cpu):
        rv = refenc.init(jax.random.PRNGKey(0), mel_in, train=False)
    rfp = FlatTree(jax.device_get(rv))

    @jax.jit
    def refenc_fwd(acc, rflat, mel_in):
        rv = rfp.unpack(rflat)
        return acc * 1e-9 + jnp.sum(refenc.apply(rv, mel_in, train=False))

    dt_ref = timed(refenc_fwd, (rfp.flat, mel_in), iters=20,
                   name="ref-encoder conv+gru (8x256)")
    report["ref_encoder_ms_8x256"] = dt_ref * 1e3

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    log("report written")


if __name__ == "__main__":
    main()
