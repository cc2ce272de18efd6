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


# Published per-chip peaks for roofline normalization (bf16 matmul TFLOP/s,
# HBM GB/s). The kernels here run f32, whose MXU rate is lower than bf16 —
# the bf16 fraction is therefore a LOWER bound on hardware utilization; both
# ceilings are reported.
CHIP_PEAKS = {
    # device_kind substring -> (bf16_tflops, hbm_gbps)
    "v6e": (918.0, 1640.0),
    "v6": (918.0, 1640.0),
    "v5e": (197.0, 819.0),
    "v5 lite": (197.0, 819.0),   # PJRT reports v5e as "TPU v5 lite"
    "v5litepod": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
}


def chip_peaks(device) -> dict:
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, (tf, bw) in CHIP_PEAKS.items():
        if key in kind:
            return {"device_kind": kind, "bf16_tflops": tf, "hbm_gbps": bw}
    return {"device_kind": kind, "bf16_tflops": None, "hbm_gbps": None,
            "note": "unknown chip; achieved numbers only"}


def roofline(name, flops, bytes_moved, seconds, peaks) -> dict:
    """Achieved vs speed-of-light: compute-bound and bandwidth-bound
    ceilings from the chip peaks (BASELINE 'kernels at per-chip
    speed-of-light'; VERDICT r1 #5)."""
    out = {
        "kernel": name,
        "flops": flops,
        "bytes": bytes_moved,
        "wall_us": seconds * 1e6,
        "achieved_tflops": flops / seconds / 1e12,
        "achieved_gbps": bytes_moved / seconds / 1e9,
        "arithmetic_intensity": flops / max(bytes_moved, 1),
    }
    if peaks.get("bf16_tflops"):
        t_compute = flops / (peaks["bf16_tflops"] * 1e12)
        t_memory = bytes_moved / (peaks["hbm_gbps"] * 1e9)
        sol = max(t_compute, t_memory)
        out["bound"] = "compute" if t_compute >= t_memory else "memory"
        out["speed_of_light_us"] = sol * 1e6
        out["fraction_of_sol"] = sol / seconds
        out["pct_bf16_peak"] = 100.0 * out["achieved_tflops"] / peaks["bf16_tflops"]
        out["pct_hbm_peak"] = 100.0 * out["achieved_gbps"] / peaks["hbm_gbps"]
    return out


def decode_step_flops(cfg, batch, t_mem, dense_band: bool = False) -> int:
    """FLOPs of ONE decoder step (the kernel's matmul graph), from config.

    dense_band=False counts the full banded-Toeplitz location contraction the
    MXU actually executes (band zeros included) — the utilization view.
    dense_band=True counts only the band's nonzero taps — the useful-work
    view (the honest numerator for %-of-SOL; the zero band flatters it ~2x
    at config-3 lengths)."""
    d = cfg.model.decoder
    a = cfg.model.attention
    m = cfg.model.num_mels
    r = d.reduction_factor
    enc = cfg.model.encoder.output_dim + (
        cfg.model.gst.style_dim if cfg.model.gst.enabled else 0)
    p1, p2 = d.prenet_dims
    mm = 0
    mm += m * p1 + p1 * p2                                   # prenet
    attn_in = p2 + enc
    mm += attn_in * 3 * d.attention_rnn_dim \
        + d.attention_rnn_dim * 3 * d.attention_rnn_dim      # attention GRU
    mm += d.attention_rnn_dim * a.dim                        # query proj
    mm += t_mem * a.dim                                      # score reduce
    if a.kind == "location_sensitive":
        # banded-Toeplitz location matmul [prev;cum] @ wloc: the MXU executes
        # the full (loc_c*T) x (T*A) contraction (band zeros included)
        c = 2 if a.cumulative else 1
        if dense_band:
            # only the band's nonzeros do useful work: each output column
            # touches at most `location_kernel_size` input positions
            mm += c * t_mem * min(a.location_kernel_size, t_mem) * a.dim
        else:
            mm += c * t_mem * t_mem * a.dim
    mm += t_mem * enc                                        # context matvec
    dec_in = d.attention_rnn_dim + enc
    mm += dec_in * d.decoder_rnn_dim                         # input proj
    mm += 2 * (d.decoder_rnn_dim * 3 * d.decoder_rnn_dim * 2)  # 2 GRUs
    mm += (d.decoder_rnn_dim + enc) * (r * m + r)            # frame+stop
    return 2 * batch * mm


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
    peaks = chip_peaks(jax.devices()[0])
    report = {"device": str(jax.devices()[0]), "steps": args.steps,
              "batch": args.batch, "chip_peaks": peaks, "roofline": []}

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

    # ---- Bahdanau decode: marginal per-step floor (VERDICT r2 #2c) ---------
    # Fixed overhead (dispatch, memory setup) vs true per-step cost: run the
    # same kernel/scan at 2x steps; marginal = (t_2N - t_N) / N. This is the
    # honest us/step floor each path can reach at long decodes.
    def make_pallas_decode(steps):
        @jax.jit
        def fn(acc, packed_flat, memory, keys, mask):
            packed = packed_fp.unpack(packed_flat)
            mel, stops, aligns = decode_scan_pallas(
                packed, memory, keys, mask,
                dec_cfg=cfg.model.decoder, attn_cfg=cfg.model.attention,
                num_mels=cfg.model.num_mels, steps=steps, use_dropout=False)
            return acc * 1e-9 + jnp.sum(mel[:, ::7, 0])
        return fn

    def make_scan_decode(steps):
        @jax.jit
        def fn(acc, flat, memory, lengths, rng_key):
            variables = fp.unpack(flat)

            def inner(mdl):
                mel, _, _, _ = mdl.decoder.decode(
                    memory, lengths, max_steps=steps,
                    deterministic_prenet=True)
                return jnp.sum(mel[:, ::7, 0])
            return acc * 1e-9 + model.apply(variables, method=inner,
                                            rngs={"dropout": rng_key})
        return fn

    n0, n1 = 1000, 2000
    dt_p0 = timed(make_pallas_decode(n0),
                  (packed_fp.flat, memory, keys, mask),
                  iters=5, name=f"pallas decode {n0} steps")
    dt_p1 = timed(make_pallas_decode(n1),
                  (packed_fp.flat, memory, keys, mask),
                  iters=5, name=f"pallas decode {n1} steps")
    dt_s0 = timed(make_scan_decode(n0),
                  (fp.flat, memory, jnp.asarray(sample["token_lengths"]),
                   jax.random.PRNGKey(0)),
                  iters=5, name=f"xla scan decode {n0} steps")
    dt_s1 = timed(make_scan_decode(n1),
                  (fp.flat, memory, jnp.asarray(sample["token_lengths"]),
                   jax.random.PRNGKey(0)),
                  iters=5, name=f"xla scan decode {n1} steps")
    report["bahdanau_marginal"] = {
        "pallas_us_per_step_marginal": (dt_p1 - dt_p0) / (n1 - n0) * 1e6,
        "pallas_fixed_overhead_us": (2 * dt_p0 - dt_p1) * 1e6,
        "xla_scan_us_per_step_marginal": (dt_s1 - dt_s0) / (n1 - n0) * 1e6,
        "xla_scan_fixed_overhead_us": (2 * dt_s0 - dt_s1) * 1e6,
        # a marginal within noise of zero makes the ratio meaningless —
        # report it only when both deltas are resolvable (>=0.2 us/step)
        "marginal_speedup": (
            (dt_s1 - dt_s0) / (dt_p1 - dt_p0)
            if min(dt_s1 - dt_s0, dt_p1 - dt_p0) / (n1 - n0) > 0.2e-6
            else None),
        "note": "marginal = (t_2000 - t_1000)/1000; the long-decode floor "
                "with fixed dispatch/setup removed; speedup omitted when "
                "either marginal is below the 0.2 us/step noise floor",
    }

    # roofline: weights are VMEM-resident across the grid, so steady-state
    # HBM traffic is inputs once + per-step output tiles
    b_pad = ((args.batch + 7) // 8) * 8
    t_pad = ((memory.shape[1] + 127) // 128) * 128
    dec_flops = args.steps * decode_step_flops(cfg, b_pad, t_pad)
    weight_bytes = sum(int(np.prod(w.shape)) * 4
                       for w in jax.tree_util.tree_leaves(packed_fp.unpack(packed_fp.flat)))
    dec_bytes = (
        weight_bytes
        + 4 * (memory.size + keys.size + mask.size)
        + 4 * args.steps * b_pad * (256 + t_pad)
    )
    report["roofline"].append(
        roofline("pallas_fused_decode", dec_flops, dec_bytes, dt_pal, peaks))

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
    stft_bytes = 4 * (
        1024 * cfg.audio.n_fft            # frames in
        + 2 * cfg.audio.n_fft * n_freq_pad  # cos/sin bases
        + n_freq_pad * 128                # mel basis
        + 1024 * n_freq_pad               # linear out
        + 1024 * 128                      # mel out
    )
    report["roofline"].append(
        roofline("pallas_stft_1024f", flops, stft_bytes, dt_stft, peaks))

    # ---- fused-framing STFT kernel vs conv-fused XLA path ------------------
    # (VERDICT r2 #2a) Same contract: (B, L) preemphasized+center-padded wav.
    from gst_tacotron_tpu.dsp.jax_dsp import JaxDSP
    from gst_tacotron_tpu.ops.stft_pallas import stft_features_pallas_fused

    jdsp = JaxDSP(cfg.audio)
    bb, t_frames = 8, 512
    wav_len = (t_frames - 1) * cfg.audio.hop_length + cfg.audio.n_fft
    prepped = jnp.asarray(
        0.3 * rng.standard_normal((bb, wav_len)), jnp.float32)

    @jax.jit
    def stft_conv_xla(acc, w):
        mel, lin = jdsp.features_precentered(w)
        return acc * 1e-9 + jnp.sum(mel[:, :, 0]) + jnp.sum(lin[:, ::31, 0])

    @jax.jit
    def stft_fused(acc, w):
        mel, lin = stft_features_pallas_fused(w, cfg.audio)
        return acc * 1e-9 + jnp.sum(mel[:, :, 0]) + jnp.sum(lin[:, ::31, 0])

    @jax.jit
    def stft_frame_then_kernel(acc, w):
        fr = jdsp.frame_precentered(w)
        b2, t2, n2 = fr.shape
        mel, lin = stft_features_pallas(fr.reshape(b2 * t2, n2), cfg.audio)
        return acc * 1e-9 + jnp.sum(mel[:, 0]) + jnp.sum(lin[::31, 0])

    dt_conv = timed(stft_conv_xla, (prepped,), iters=10,
                    name=f"stft conv-fused XLA ({bb}x{t_frames}f)")
    dt_fused = timed(stft_fused, (prepped,), iters=10,
                     name=f"stft fused-framing pallas ({bb}x{t_frames}f)")
    dt_old = timed(stft_frame_then_kernel, (prepped,), iters=10,
                   name=f"stft frame-then-kernel ({bb}x{t_frames}f)")

    from gst_tacotron_tpu.ops.stft_pallas import (
        stft_features_pallas_resident,
    )

    @jax.jit
    def stft_resident(acc, w):
        mel, lin = stft_features_pallas_resident(w, cfg.audio, bf16=True)
        return acc * 1e-9 + jnp.sum(mel[:, :, 0]) + jnp.sum(lin[:, ::31, 0])

    dt_resident = timed(stft_resident, (prepped,), iters=10,
                        name=f"stft resident-bases pallas ({bb}x{t_frames}f)")
    report["stft_paths_ms"] = {
        "conv_fused_xla": dt_conv * 1e3,
        "pallas_fused_framing": dt_fused * 1e3,
        "pallas_resident_bases_bf16": dt_resident * 1e3,
        "pallas_frame_then_kernel": dt_old * 1e3,
        "resident_vs_conv_speedup": dt_conv / dt_resident,
    }
    n_freq_pad = ((cfg.audio.num_freq + 127) // 128) * 128
    t_pad_f = ((t_frames + 127) // 128) * 128
    # matmul K dim = the window's LIVE span (zero-tap elision), taken from
    # the kernel's own computation — a closed-form approximation here
    # overstated FLOPs ~25% at production params (ADVICE r3)
    from gst_tacotron_tpu.ops.stft_pallas import live_tap_span

    _, _, n_live = live_tap_span(cfg.audio)
    fflops = (2 * bb * t_pad_f * n_live * n_freq_pad * 2
              + 2 * bb * t_pad_f * n_freq_pad * 128)
    fbytes = 4 * (bb * t_pad_f * cfg.audio.hop_length
                  + 2 * n_live * n_freq_pad
                  + bb * t_pad_f * (n_freq_pad + 128))
    report["roofline"].append(
        roofline("pallas_stft_fused_framing", fflops, fbytes, dt_fused,
                 peaks))

    # In-program marginals, r5 methodology (per-call walls include the
    # ~1.4 ms dispatch floor; see the ref-encoder marginal note below).
    # THREE hard-won harness rules (CLAUDE.md #21, tools/stft_probe*_r5.py):
    #  1. The checksum must consume EVERY output element (full sums). A
    #     sliced checksum (mel[:,:,0], lin[:,::31,0]) lets XLA propagate the
    #     slice into the conv weights and dead-code-eliminate ~99% of the
    #     XLA form's channels; Pallas forms are opaque and compute
    #     everything — the r4 "conv 119.8 us / 87% SOL" row was this.
    #  2. The carry-dependent modulation must be NON-SEPARABLE:
    #     cos(a + ramp) = cos a cos ramp - sin a sin ramp is rank-2, and the
    #     DFT is linear, so XLA hoists conv(w*cos ramp), conv(w*sin ramp)
    #     out of the loop (observed: 57 us "conv" = 360 nominal TF, above
    #     the 197 TF chip peak). cos((1+a)*ramp) has no finite separable
    #     decomposition.
    #  3. Session drift (~±20%) swamps single-row x-hi-minus-x-lo deltas
    #     measured minutes apart: interleave all forms round-robin, compute
    #     per-cycle marginals, report the median (+IQR).
    stft_marg_forms = {
        "conv_xla": lambda w: jdsp.features_precentered(w),
        "fused": lambda w: stft_features_pallas_fused(w, cfg.audio),
        "resident_f32": lambda w: stft_features_pallas_resident(w, cfg.audio),
        "resident_bf16": lambda w: stft_features_pallas_resident(
            w, cfg.audio, bf16=True),
    }

    def make_stft_loop(fn, n):
        @jax.jit
        def f(acc, w):
            ramp = jnp.arange(w.shape[-1], dtype=jnp.float32) \
                * (1.0 / w.shape[-1])

            def body(i, a):
                wi = w * (1.0 + 1e-12 * jnp.cos((1.0 + a) * ramp))
                mel, lin = fn(wi)
                return a + (jnp.sum(mel) + jnp.sum(lin)) * 1e-9
            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    import statistics as _stats

    N_LO, N_HI, CYCLES = 4, 34, 8
    stft_loops = {k: (make_stft_loop(fn, N_LO), make_stft_loop(fn, N_HI))
                  for k, fn in stft_marg_forms.items()}
    stft_margs = {k: [] for k in stft_marg_forms}
    for _cyc in range(CYCLES):
        for k, (flo, fhi) in stft_loops.items():
            t_lo = timed(flo, (prepped,), iters=6, name=f"stft {k} lo")
            t_hi = timed(fhi, (prepped,), iters=6, name=f"stft {k} hi")
            stft_margs[k].append((t_hi - t_lo) / (N_HI - N_LO))
    report["stft_marginal_us"] = {}
    report["stft_marginal_iqr_us"] = {}
    for k, ms in stft_margs.items():
        marg = _stats.median(ms)
        q = _stats.quantiles(ms, n=4)
        report["stft_marginal_us"][k] = marg * 1e6
        report["stft_marginal_iqr_us"][k] = [q[0] * 1e6, q[2] * 1e6]
        log(f"stft {k} marginal: {marg*1e6:.1f} us/call "
            f"IQR [{q[0]*1e6:.1f}, {q[2]*1e6:.1f}]")
        report["roofline"].append(
            roofline(f"stft_{k}_marginal", fflops, fbytes, marg, peaks))

    @jax.jit
    def stft_parity(w):
        mel_a, lin_a = jdsp.features_precentered(w)
        mel_b, lin_b = stft_features_pallas_fused(w, cfg.audio)
        mel_c, lin_c = stft_features_pallas_resident(w, cfg.audio, bf16=True)
        e1 = jnp.maximum(jnp.max(jnp.abs(mel_a - mel_b)),
                         jnp.max(jnp.abs(lin_a - lin_b)))
        e2 = jnp.maximum(jnp.max(jnp.abs(mel_a - mel_c)),
                         jnp.max(jnp.abs(lin_a - lin_c)))
        return e1, e2

    e_fused, e_res = (float(np.asarray(x)) for x in stft_parity(prepped))
    report["stft_fused_parity_max_err"] = e_fused
    report["stft_resident_bf16_parity_max_err"] = e_res
    log("stft parity max err: fused", e_fused, "resident_bf16", e_res)

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

    # conv-stack roofline (the GRU tail is tiny and latency-bound)
    rflops = 0
    rbytes = 4 * mel_in.size
    h, w, c_in = 256, cfg.model.num_mels, 1
    for ch in cfg.model.gst.ref_conv_channels:
        h, w = (h + 1) // 2, (w + 1) // 2
        rflops += 2 * 8 * h * w * 9 * c_in * ch
        rbytes += 4 * (9 * c_in * ch + 8 * h * w * ch)
        c_in = ch
    report["roofline"].append(
        roofline("ref_encoder_conv_stack", rflops, rbytes, dt_ref, peaks))

    # ---- fused ref-encoder kernel (VERDICT r2 #2b) -------------------------
    from gst_tacotron_tpu.ops.refenc_pallas import ref_encoder_pallas

    rparams = jax.device_get(rv)["params"]
    rstats = jax.device_get(rv)["batch_stats"]
    rpfp = FlatTree({"params": rparams, "batch_stats": rstats})

    @jax.jit
    def refenc_kernel_fwd(acc, rflat, mel_in):
        v = rpfp.unpack(rflat)
        emb = ref_encoder_pallas(v["params"], v["batch_stats"],
                                 cfg.model.gst, mel_in, batched=False)
        return acc * 1e-9 + jnp.sum(emb)

    dt_refk = timed(refenc_kernel_fwd, (rpfp.flat, mel_in), iters=20,
                    name="ref-encoder FUSED kernel+gru (8x256)")
    report["ref_encoder_fused_ms_8x256"] = dt_refk * 1e3
    report["ref_encoder_fused_speedup"] = dt_ref / dt_refk
    report["roofline"].append(
        roofline("ref_encoder_fused_kernel", rflops, rbytes, dt_refk, peaks))

    # ---- whole-batch 3-matmul-per-layer form (the production default at
    # t % 2**n_layers == 0): batch+height fused into matmul rows,
    # width+channels into lanes, width taps folded into block-banded phase
    # matrices (ops/refenc_pallas.py::refenc_stack_pallas_batched)
    @jax.jit
    def refenc_batched_fwd(acc, rflat, mel_in):
        v = rpfp.unpack(rflat)
        emb = ref_encoder_pallas(v["params"], v["batch_stats"],
                                 cfg.model.gst, mel_in, batched=True)
        return acc * 1e-9 + jnp.sum(emb)

    dt_refb = timed(refenc_batched_fwd, (rpfp.flat, mel_in), iters=20,
                    name="ref-encoder BATCHED kernel+gru (8x256)")
    report["ref_encoder_batched_ms_8x256"] = dt_refb * 1e3
    report["ref_encoder_batched_speedup_vs_xla"] = dt_ref / dt_refb
    report["ref_encoder_batched_speedup_vs_fused"] = dt_refk / dt_refb
    report["roofline"].append(
        roofline("ref_encoder_batched_kernel", rflops, rbytes, dt_refb,
                 peaks))

    # ---- in-program marginal cost of the three forms -----------------------
    # Per-call timings of this block sit on a ~1.4 ms dispatch floor on this
    # runtime (a null program, an M-build-only program, and the tiny GRU all
    # measure ~1.4 ms in a chained loop), so per-call walls cannot resolve a
    # sub-millisecond conv stack. Measure the IN-PROGRAM cost instead: run
    # the full refenc N times inside ONE jit (fori_loop, data-chained via an
    # input perturbation) and difference two loop lengths — the same
    # methodology as bahdanau_marginal. This is also the production-relevant
    # number: in the headline synthesis program the refenc is one region of
    # a much larger jit.
    def make_refenc_loop(form, n):
        @jax.jit
        def f(acc, rflat, mel_in):
            v = rpfp.unpack(rflat)

            ramp = jnp.arange(mel_in.shape[-1], dtype=jnp.float32)

            def body(i, a):
                # non-hoistable elementwise modulation: the first conv layer
                # is linear, so a scalar-additive perturbation would let XLA
                # hoist it out of the loop; cos((1+a)*ramp) instead of
                # cos(a+ramp) because angle-addition is rank-2 separable and
                # the first (linear) conv could be hoisted the same way
                # (CLAUDE.md #21 rule b — only the pre-ReLU prefix is at
                # risk here, but keep the forms identical across rows)
                x = mel_in * (1.0 + 1e-12 * jnp.cos((1.0 + a) * ramp))
                if form == "flax":
                    emb = refenc.apply(
                        {"params": v["params"],
                         "batch_stats": v["batch_stats"]}, x, train=False)
                else:
                    emb = ref_encoder_pallas(
                        v["params"], v["batch_stats"], cfg.model.gst, x,
                        batched=(form == "batched"))
                return a + jnp.sum(emb) * 1e-9

            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    n0, n1 = 2, 10
    report["ref_encoder_marginal_us"] = {}
    for form in ("flax", "grid", "batched"):
        t_lo = timed(make_refenc_loop(form, n0), (rpfp.flat, mel_in),
                     iters=10, name=f"refenc {form} x{n0} in-program")
        t_hi = timed(make_refenc_loop(form, n1), (rpfp.flat, mel_in),
                     iters=10, name=f"refenc {form} x{n1} in-program")
        marg = (t_hi - t_lo) / (n1 - n0)
        report["ref_encoder_marginal_us"][form] = marg * 1e6
        log(f"refenc {form} marginal: {marg*1e6:.1f} us/call (incl. GRU)")
        report["roofline"].append(
            roofline(f"ref_encoder_{form}_marginal", rflops, rbytes, marg,
                     peaks))

    # ---- bf16 batched form (the r4 floor-analysis targeted fix) -----------
    def make_refenc_bf16_loop(n):
        @jax.jit
        def f(acc, rflat, mel_in):
            v = rpfp.unpack(rflat)

            ramp = jnp.arange(mel_in.shape[-1], dtype=jnp.float32)

            def body(i, a):
                # same non-hoistable modulation as the f32 refenc loop
                # (pallas_call is opaque to XLA, but keep the loop bodies
                # identical so the rows stay comparable)
                x = mel_in * (1.0 + 1e-12 * jnp.cos((1.0 + a) * ramp))
                emb = ref_encoder_pallas(
                    v["params"], v["batch_stats"], cfg.model.gst,
                    x, batched=True, bf16=True)
                return a + jnp.sum(emb) * 1e-9

            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    t_lo = timed(make_refenc_bf16_loop(n0), (rpfp.flat, mel_in), iters=10,
                 name=f"refenc batched-bf16 x{n0} in-program")
    t_hi = timed(make_refenc_bf16_loop(n1), (rpfp.flat, mel_in), iters=10,
                 name=f"refenc batched-bf16 x{n1} in-program")
    marg_bf16 = (t_hi - t_lo) / (n1 - n0)
    report["ref_encoder_marginal_us"]["batched_bf16"] = marg_bf16 * 1e6
    log(f"refenc batched-bf16 marginal: {marg_bf16*1e6:.1f} us/call")

    # ---- memory/compute floor analysis (VERDICT r3 #6) ---------------------
    # THE minimal HBM traffic any implementation must pay at (8, 256, 80):
    # read the input once, read every true weight once, write the embedding.
    from gst_tacotron_tpu.ops.refenc_pallas import (
        build_refenc_bmats, fold_bn,
    )

    true_weight_elems = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(rparams))
    emb_elems = 8 * cfg.model.gst.ref_gru_dim
    true_min_bytes = 4 * (int(mel_in.size) + true_weight_elems + emb_elems)

    # the batched DESIGN's own obligatory traffic and FLOPs: dense block-
    # banded phase matrices (the width-tap/channel fold inflates both)
    kernels_l = [rparams[f"conv_{i}"]["kernel"]
                 for i in range(len(cfg.model.gst.ref_conv_channels))]
    scales_l, biases_l = [], []
    for i in range(len(kernels_l)):
        sc, bi = fold_bn(rparams[f"bn_{i}"], rstats[f"bn_{i}"])
        scales_l.append(sc)
        biases_l.append(bi)
    mats, plan = build_refenc_bmats(kernels_l, scales_l, biases_l,
                                    256, cfg.model.num_mels)
    design_mat_elems = sum(int(np.prod(a.shape)) for layer in mats
                           for a in layer)
    design_flops = 0
    for lp in plan:
        design_flops += (3 * 2 * (8 * lp["hp_out"])
                         * (lp["wp_in"] * lp["c_in"])
                         * (lp["wp_out"] * lp["c_out"]))
    design_bytes_f32 = 4 * (int(mel_in.size) + design_mat_elems + emb_elems)
    bw = peaks["hbm_gbps"] * 1e9
    tf_bf16 = peaks["bf16_tflops"] * 1e12
    tf_f32 = tf_bf16 / 2  # MXU f32 rate is half the bf16 rate on v5e
    marg_batched = report["ref_encoder_marginal_us"]["batched"] * 1e-6
    report["ref_encoder_floor_analysis"] = {
        "shape": "(8, 256, 80) incl. GRU tail",
        "true_min_bytes": true_min_bytes,
        "true_memory_floor_us": true_min_bytes / bw * 1e6,
        "design_bytes_f32": design_bytes_f32,
        "design_flops": design_flops,
        "design_compute_floor_f32_us": design_flops / tf_f32 * 1e6,
        "design_compute_floor_bf16_us": design_flops / tf_bf16 * 1e6,
        "measured_batched_us": marg_batched * 1e6,
        "measured_batched_bf16_us": marg_bf16 * 1e6,
        "batched_vs_own_f32_compute_floor": (
            design_flops / tf_f32) / marg_batched,
        "batched_bf16_vs_own_bf16_compute_floor": (
            design_flops / tf_bf16) / marg_bf16,
        "true_floor_fraction_f32": (true_min_bytes / bw) / marg_batched,
        "note": (
            "The batched form deliberately inflates FLOPs (dense block-"
            "banded phase matmuls fold width taps + channel mix into MXU-"
            "shaped matmuls) to escape the conv's tiny-matmul ~6% MXU "
            "utilization; it is therefore COMPUTE-bound on its own design "
            "FLOPs, not HBM-bound. The true-minimal-bytes memory floor is "
            "unreachable by ANY dense-matmul formulation of this stack — "
            "reaching it requires minimal-FLOP convs whose shapes the MXU "
            "cannot tile efficiently (the measured 5-15x slower grid/XLA "
            "forms). bf16 operands double the MXU rate, the one lever "
            "left; fraction-of-own-floor near 1.0 retires the gap."
        ),
    }
    log(f"refenc floor: true-min {true_min_bytes/1e6:.2f} MB "
        f"({true_min_bytes/bw*1e6:.1f} us), design compute floor f32 "
        f"{design_flops/tf_f32*1e6:.1f} us / bf16 "
        f"{design_flops/tf_bf16*1e6:.1f} us")

    # on-chip parity: fused kernel vs flax module (Mosaic-compiled)
    @jax.jit
    def refenc_parity(rflat, mel_in):
        v = rpfp.unpack(rflat)
        ref_flax = refenc.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            mel_in, train=False)
        ref_k = ref_encoder_pallas(v["params"], v["batch_stats"],
                                   cfg.model.gst, mel_in)
        return jnp.max(jnp.abs(ref_flax - ref_k))

    report["ref_encoder_fused_parity_max_err"] = float(
        np.asarray(refenc_parity(rpfp.flat, mel_in)))
    log("refenc fused parity max err:",
        report["ref_encoder_fused_parity_max_err"])

    # ---- LSA fused decode (config 3: r=1, 31-tap location conv) ------------
    from gst_tacotron_tpu.config import get_preset as _gp
    from gst_tacotron_tpu.models.decoder import Decoder

    cfg3 = _gp("gst_r1_location")
    mem_dim3 = cfg3.model.encoder.output_dim + cfg3.model.gst.style_dim
    dec3 = Decoder(cfg3.model.decoder, cfg3.model.attention,
                   cfg3.model.num_mels, mem_dim3)
    with jax.default_device(cpu):
        mem3_h = rng.standard_normal((args.batch, t_text, mem_dim3)).astype(
            np.float32)
        v3 = dec3.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(mem3_h), jnp.asarray(sample["token_lengths"]),
            jnp.zeros((args.batch, 4, cfg3.model.num_mels)),
            method=dec3.teacher_forced,
        )
    cell3 = jax.device_get(v3)["params"]["cell"]
    packed3_fp = FlatTree(pack_decoder_weights(
        cell3, cfg3.model.num_mels, 1,
        tuple(cfg3.model.decoder.prenet_dims)))

    @jax.jit
    def keys3(flat, mem):
        v = {"params": {"cell": FlatTree(cell3).unpack(flat)}}
        return dec3.apply(v, mem,
                          method=lambda m, mm: m.cell.precompute_keys(mm))

    cell3_fp = FlatTree(cell3)
    mem3 = jnp.asarray(mem3_h)
    k3 = keys3(cell3_fp.flat, mem3)
    lsa_steps = 1000

    @jax.jit
    def pallas_decode_lsa(acc, packed_flat, mem, kk, mask):
        packed = packed3_fp.unpack(packed_flat)
        mel, stops, aligns = decode_scan_pallas(
            packed, mem, kk, mask,
            dec_cfg=cfg3.model.decoder, attn_cfg=cfg3.model.attention,
            num_mels=cfg3.model.num_mels, steps=lsa_steps,
            use_dropout=False)
        return acc * 1e-9 + jnp.sum(mel[:, ::7, 0])

    dt_lsa = timed(pallas_decode_lsa, (packed3_fp.flat, mem3, k3, mask),
                   iters=5, name=f"pallas LSA decode ({lsa_steps} steps)")
    report["pallas_lsa_decode_ms"] = dt_lsa * 1e3
    report["pallas_lsa_us_per_step"] = dt_lsa / lsa_steps * 1e6

    @jax.jit
    def scan_decode_lsa(acc, flat, mem, lengths, rng_key):
        v = {"params": {"cell": cell3_fp.unpack(flat)}}

        def fn(mdl, mm, ll):
            mel, stops, aligns, fl = mdl.decode(
                mm, ll, max_steps=lsa_steps, deterministic_prenet=True)
            return jnp.sum(mel[:, ::7, 0])
        return acc * 1e-9 + dec3.apply(v, mem, lengths, method=fn,
                                       rngs={"dropout": rng_key})

    dt_scan_lsa = timed(
        scan_decode_lsa,
        (cell3_fp.flat, mem3, jnp.asarray(sample["token_lengths"]),
         jax.random.PRNGKey(0)),
        iters=3, name=f"xla scan LSA decode ({lsa_steps} steps)")
    report["xla_scan_lsa_decode_ms"] = dt_scan_lsa * 1e3
    report["lsa_decode_speedup"] = dt_scan_lsa / dt_lsa

    lsa_flops = lsa_steps * decode_step_flops(cfg3, b_pad, t_pad)
    w3_bytes = sum(int(np.prod(w.shape)) * 4 for w in
                   jax.tree_util.tree_leaves(packed3_fp.unpack(packed3_fp.flat)))
    lsa_bytes = (w3_bytes + 4 * (mem3.size + k3.size + mask.size)
                 + 4 * lsa_steps * b_pad * (256 + t_pad))
    report["roofline"].append(
        roofline("pallas_lsa_decode", lsa_flops, lsa_bytes, dt_lsa, peaks))
    # useful-work view: band zeros excluded (VERDICT r2 — the dense
    # contraction flatters %-of-SOL ~2x at config-3 lengths)
    lsa_flops_dense = lsa_steps * decode_step_flops(
        cfg3, b_pad, t_pad, dense_band=True)
    report["roofline"].append(roofline(
        "pallas_lsa_decode_useful_band", lsa_flops_dense, lsa_bytes,
        dt_lsa, peaks))

    # ---- WaveRNN AR sampling: throughput scaling over streams --------------
    # The sampler is latency-bound per step (one GRU-512 step per audio
    # sample), so batching more streams is ~free until the MXU saturates —
    # the aggregate-realtime column is the serving-throughput datum.
    from gst_tacotron_tpu.models.wavernn import WaveRNN
    from gst_tacotron_tpu.ops.wavernn_pallas import (
        pack_wavernn_weights, wavernn_sample_pallas,
    )

    vcfg = cfg.model.vocoder
    wmodel = WaveRNN(vcfg, cfg.model.num_mels)
    frames = 24
    with jax.default_device(cpu):
        wvars = wmodel.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, frames, cfg.model.num_mels)),
            jnp.zeros((1, frames * vcfg.wavernn_hop)))
    wparams = jax.device_get(wvars)["params"]
    packed_fp = FlatTree(pack_wavernn_weights(wparams, vcfg))
    wfp = FlatTree({"params": wparams})
    sr = cfg.audio.sample_rate
    report["wavernn_scaling"] = []
    for wb in (4, 16, 32):
        mel_in = rng.standard_normal(
            (wb, frames, cfg.model.num_mels)).astype(np.float32)

        @jax.jit
        def wsample(acc, flat, packed_flat, mel, seed):
            variables = wfp.unpack(flat)
            packed = packed_fp.unpack(packed_flat)
            cond = wmodel.apply(variables, mel,
                                method=wmodel.upsample_cond)
            classes = wavernn_sample_pallas(
                packed, cond, cfg=vcfg, seed=seed)
            return acc * 1e-9 + jnp.float32(jnp.sum(classes[:, ::97]))

        dt = timed(wsample,
                   (wfp.flat, packed_fp.flat, jnp.asarray(mel_in),
                    jnp.int32(7)),
                   iters=5, name=f"wavernn sample B={wb}")
        s = frames * vcfg.wavernn_hop
        report["wavernn_scaling"].append({
            "streams": wb,
            "us_per_sample_step": dt / s * 1e6,
            "aggregate_samples_per_sec": wb * s / dt,
            "aggregate_realtime_x": wb * s / dt / sr,
        })

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    log("report written")


if __name__ == "__main__":
    main()
