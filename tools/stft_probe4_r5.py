"""Round-5 STFT probe, pass 4: interleaved head-to-head (drift-robust).

Probe 3 fixed the separability hole; its residual problem is session drift
between rows measured minutes apart (one rep of the t256 row read 60 us =
340 nominal TF, above chip peak — drift, not physics). Here the candidate
forms are timed round-robin: each cycle measures (lo, hi) for EVERY form
back-to-back, marginals are computed per cycle, and the final number is the
median across cycles with the IQR reported. Cross-form comparisons within a
cycle share whatever drift state the session is in.

(The probe-3 "null" row's 176 us is its own body — a stride-17 lane-hostile
slice relayout — not harness overhead; the modulation harness itself costs
a few us. No null row here.)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print("[probe4]", *a, file=sys.stderr, flush=True)


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

    def make_loop(fn, n):
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

    N_LO, N_HI, CYCLES, ITERS = 4, 34, 10, 8

    def timed(fn, iters):
        acc = fn(jnp.float32(0.0), prepped)
        _ = np.asarray(acc)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc = fn(acc, prepped)
        _ = np.asarray(acc)
        return (time.perf_counter() - t0) / iters

    loops = {k: (make_loop(fn, N_LO), make_loop(fn, N_HI))
             for k, fn in forms.items()}
    for k, (flo, fhi) in loops.items():
        _ = np.asarray(flo(jnp.float32(0.0), prepped))
        _ = np.asarray(fhi(jnp.float32(0.0), prepped))
        log(f"compiled {k}")

    per_form = {k: [] for k in forms}
    for cyc in range(CYCLES):
        for k, (flo, fhi) in loops.items():
            t_lo = timed(flo, ITERS)
            t_hi = timed(fhi, ITERS)
            per_form[k].append((t_hi - t_lo) / (N_HI - N_LO))
        log(f"cycle {cyc}: " + "  ".join(
            f"{k}={per_form[k][-1]*1e6:.0f}" for k in forms))

    report = {"shape": f"({bb}, {t_frames} frames)", "flops": fflops,
              "n_lo": N_LO, "n_hi": N_HI, "cycles": CYCLES, "iters": ITERS,
              "marginal_us": {}, "iqr_us": {}, "cycles_us": {}}
    for k, ms in per_form.items():
        med = statistics.median(ms)
        q = statistics.quantiles(ms, n=4)
        report["marginal_us"][k] = med * 1e6
        report["iqr_us"][k] = [q[0] * 1e6, q[2] * 1e6]
        report["cycles_us"][k] = [m * 1e6 for m in ms]
        log(f"=> {k}: median {med*1e6:.1f} us  IQR [{q[0]*1e6:.1f}, "
            f"{q[2]*1e6:.1f}]  {fflops / med / 1e12:.1f} nominal TF")

    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
