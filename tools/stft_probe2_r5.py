"""Round-5 STFT probe, pass 2: low-noise marginals + true-precision classing.

Probe 1 (tools/stft_probe_r5.py) established parity structure: on this TPU
every form — conv-XLA "f32", Pallas f32, Pallas bf16 — agrees to <=1.2e-7,
and the explicit-bf16 conv is BIT-IDENTICAL to the "f32" conv. That is only
possible if XLA's DEFAULT matmul/conv precision here is bf16 operands with
f32 accumulation, and Mosaic's f32 jnp.dot defaults the same way. So all
forms are the same precision class; the race is pure throughput.

Probe 1's x10-x2 deltas (~1 ms) drowned in session wall variance (~1 ms):
two rows went negative. Here: x4 vs x34 (30-call delta, 3.5-6 ms), three
paired repeats, min-of-reps.

Also: on-chip outputs vs a CPU-f32 oracle of the same graph, to quantify
the TPU default-precision rounding against true f32.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print("[probe2]", *a, file=sys.stderr, flush=True)


def main():
    from gst_tacotron_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.config import get_preset
    from gst_tacotron_tpu.dsp.jax_dsp import JaxDSP
    from gst_tacotron_tpu.ops.stft_pallas import (
        live_tap_span,
        stft_features_pallas_fused,
        stft_features_pallas_resident,
    )

    cfg = get_preset("gst_lj").audio
    jdsp = JaxDSP(cfg)
    rng = np.random.default_rng(0)
    bb, t_frames = 8, 512
    wav_len = (t_frames - 1) * cfg.hop_length + cfg.n_fft
    prepped = jnp.asarray(
        0.3 * rng.standard_normal((bb, wav_len)), jnp.float32)

    n_freq_pad = ((cfg.num_freq + 127) // 128) * 128
    t_pad_f = ((t_frames + 127) // 128) * 128
    _, _, n_live = live_tap_span(cfg)
    fflops = (2 * bb * t_pad_f * n_live * n_freq_pad * 2
              + 2 * bb * t_pad_f * n_freq_pad * 128)

    forms = {
        "conv_xla": lambda w: jdsp.features_precentered(w),
        "fused_r4": lambda w: stft_features_pallas_fused(w, cfg),
        "resident_f32": lambda w: stft_features_pallas_resident(w, cfg),
        "resident_bf16": lambda w: stft_features_pallas_resident(
            w, cfg, bf16=True),
        "resident_bf16_t256": lambda w: stft_features_pallas_resident(
            w, cfg, bf16=True, tile_f=256),
    }
    # slice-checksum rows only for conv (to quantify the r4 DCE artifact)
    rows = [(f, "full") for f in forms] + [("conv_xla", "slice")]

    def make_loop(fn, n, checksum):
        @jax.jit
        def f(acc, w):
            ramp = jnp.arange(w.shape[-1], dtype=jnp.float32)

            def body(i, a):
                wi = w * (1.0 + 1e-12 * jnp.cos(a + ramp))
                mel, lin = fn(wi)
                if checksum == "slice":
                    s = jnp.sum(mel[:, :, 0]) + jnp.sum(lin[:, ::31, 0])
                else:
                    s = jnp.sum(mel) + jnp.sum(lin)
                return a + s * 1e-9
            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    N_LO, N_HI, REPS, ITERS = 4, 34, 3, 8

    def timed(fn, iters, warm):
        acc = fn(jnp.float32(0.0), prepped) if warm else fn(
            jnp.float32(0.0), prepped)
        _ = np.asarray(acc)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc = fn(acc, prepped)
        _ = np.asarray(acc)
        return (time.perf_counter() - t0) / iters

    report = {"shape": f"({bb}, {t_frames} frames)", "flops": fflops,
              "n_lo": N_LO, "n_hi": N_HI, "reps": REPS,
              "marginal_us": {}, "marginal_us_reps": {}}
    loops = {}
    for fname, cname in rows:
        key = f"{fname}[{cname}]" if cname != "full" else fname
        loops[key] = (make_loop(forms[fname], N_LO, cname),
                      make_loop(forms[fname], N_HI, cname))
        # compile both now (warm-up call inside timed)
    for key, (flo, fhi) in loops.items():
        margs = []
        for rep in range(REPS):
            t_lo = timed(flo, ITERS, warm=(rep == 0))
            t_hi = timed(fhi, ITERS, warm=(rep == 0))
            margs.append((t_hi - t_lo) / (N_HI - N_LO))
        marg = min(margs)
        report["marginal_us"][key] = marg * 1e6
        report["marginal_us_reps"][key] = [m * 1e6 for m in margs]
        log(f"=> {key}: {marg*1e6:.1f} us  (reps: "
            + ", ".join(f"{m*1e6:.1f}" for m in margs)
            + f")  {fflops / marg / 1e12:.1f} nominal TF")

    # true-precision classing: TPU outputs vs CPU-f32 oracle of same graph
    cpu = jax.devices("cpu")[0]
    w_np = np.asarray(prepped)
    with jax.default_device(cpu):
        mel_cpu, lin_cpu = jax.jit(forms["conv_xla"])(jnp.asarray(w_np))
        mel_cpu, lin_cpu = np.asarray(mel_cpu), np.asarray(lin_cpu)
    report["err_vs_cpu_f32"] = {}
    for fname, fn in forms.items():
        mel_t, lin_t = jax.jit(fn)(prepped)
        err = max(float(np.max(np.abs(np.asarray(mel_t) - mel_cpu))),
                  float(np.max(np.abs(np.asarray(lin_t) - lin_cpu))))
        report["err_vs_cpu_f32"][fname] = err
        log(f"{fname} max |err| vs CPU f32 oracle: {err:.2e}")

    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
