"""Round-5 STFT probe, pass 3: non-SEPARABLE modulation + median-of-reps.

Probe 2 caught the r4 methodology (CLAUDE.md #21) being beaten a second
time: the carry-dependent modulation cos(a + ramp) is rank-2 SEPARABLE
(cos a * cos ramp - sin a * sin ramp), and the DFT conv is linear, so XLA
hoists conv(w*cos ramp) and conv(w*sin ramp) out of the marginal loop and
reconstructs each iteration with two scalar multiplies — the conv itself
contributes nothing to the measured marginal (observed: 57 us "conv" row =
360 nominal TFLOP/s, ABOVE the 197 TF chip peak, a physical impossibility).
Pallas rows are opaque to XLA and unaffected — the artifact biased every
r3/r4 kernel-vs-XLA STFT comparison in XLA's favor.

Fix: modulate with cos(a * ramp) — the iteration index multiplies the
sample index INSIDE the transcendental, which has no finite separable
decomposition, so no part of the conv is loop-invariant.

Noise: session wall variance made min-of-3 unreliable (probe 2 reps spread
93-185 us on one row, and min-of-reps produced >peak readings). Here:
5 paired (lo, hi) reps, 16 timed calls each, MEDIAN of per-rep marginals,
plus a modulation-only row measuring the harness's own per-iteration cost.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print("[probe3]", *a, file=sys.stderr, flush=True)


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

    def null_form(w):
        # modulation-harness cost only: consume w through a cheap nonlinear
        # reduction with no STFT
        return (jnp.tanh(w[:, ::17, None]),
                jnp.tanh(w[:, 1::17, None]))

    forms = {
        "null": null_form,
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
                # NON-SEPARABLE carry-dependent modulation: a multiplies the
                # sample index inside the cosine
                wi = w * (1.0 + 1e-12 * jnp.cos((1.0 + a) * ramp))
                mel, lin = fn(wi)
                return a + (jnp.sum(mel) + jnp.sum(lin)) * 1e-9
            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    N_LO, N_HI, REPS, ITERS = 4, 34, 5, 16

    def timed(fn, iters):
        acc = fn(jnp.float32(0.0), prepped)
        _ = np.asarray(acc)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc = fn(acc, prepped)
        _ = np.asarray(acc)
        return (time.perf_counter() - t0) / iters

    report = {"shape": f"({bb}, {t_frames} frames)", "flops": fflops,
              "n_lo": N_LO, "n_hi": N_HI, "reps": REPS, "iters": ITERS,
              "marginal_us": {}, "marginal_us_reps": {}}
    loops = {k: (make_loop(fn, N_LO), make_loop(fn, N_HI))
             for k, fn in forms.items()}
    # compile everything first (interleaves better with rep timing)
    for k, (flo, fhi) in loops.items():
        _ = np.asarray(flo(jnp.float32(0.0), prepped))
        _ = np.asarray(fhi(jnp.float32(0.0), prepped))
        log(f"compiled {k}")
    for key, (flo, fhi) in loops.items():
        margs = []
        for rep in range(REPS):
            t_lo = timed(flo, ITERS)
            t_hi = timed(fhi, ITERS)
            margs.append((t_hi - t_lo) / (N_HI - N_LO))
        marg = statistics.median(margs)
        report["marginal_us"][key] = marg * 1e6
        report["marginal_us_reps"][key] = [m * 1e6 for m in margs]
        log(f"=> {key}: {marg*1e6:.1f} us  (reps: "
            + ", ".join(f"{m*1e6:.1f}" for m in margs)
            + f")  {fflops / marg / 1e12:.1f} nominal TF")

    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
