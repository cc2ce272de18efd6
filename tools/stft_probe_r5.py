"""Round-5 STFT marginal probe: DCE-proof checksums + resident-bases kernel.

Motivation (VERDICT r4 next-item #1): the r4 marginal harness checksummed
only mel[:, :, 0] and lin[:, ::31, 0]. The conv-XLA STFT is a plain conv +
matmul graph, so XLA can propagate those slices INTO the weights (dead-code
eliminate ~99% of the 2050 output channels); the Pallas kernel is opaque to
XLA and always computes everything. The r4 "conv-XLA at 87% of SOL
(119.8 us, 171 nominal TFLOP/s)" figure is physically impossible in the
precision class its own 1.2e-7 parity row proves (f32-grade), which flags
the DCE hole. This probe measures every form under BOTH checksums:

  * slice — the r4 checksum, reproduced for continuity;
  * full  — sums over EVERY output element of both feature maps (nothing
    prunable; the reduction itself is ~5 M adds, noise vs the 20 GFLOP op).

Forms: conv-XLA (f32 + bf16-operand variants), r4 fused freq-tiled kernel,
r5 resident-bases kernel (f32 + bf16), at tile_f 128 and 256.

Run: PYTHONPATH=.:/root/.axon_site python tools/stft_probe_r5.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print("[probe]", *a, file=sys.stderr, flush=True)


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

    def conv_xla(w):
        return jdsp.features_precentered(w)

    def conv_xla_bf16(w):
        re, im = jdsp.stft_ri_precentered(w, low_precision=True)
        return jdsp._features_from_ri(re, im)

    def fused(w):
        return stft_features_pallas_fused(w, cfg)

    def resident(w):
        return stft_features_pallas_resident(w, cfg)

    def resident_bf16(w):
        return stft_features_pallas_resident(w, cfg, bf16=True)

    def resident_256(w):
        return stft_features_pallas_resident(w, cfg, tile_f=256)

    def resident_bf16_256(w):
        return stft_features_pallas_resident(w, cfg, bf16=True, tile_f=256)

    forms = {
        "conv_xla": conv_xla,
        "conv_xla_bf16": conv_xla_bf16,
        "fused_r4": fused,
        "resident_f32": resident,
        "resident_bf16": resident_bf16,
        "resident_f32_t256": resident_256,
        "resident_bf16_t256": resident_bf16_256,
    }

    def make_loop(fn, n, checksum):
        @jax.jit
        def f(acc, w):
            ramp = jnp.arange(w.shape[-1], dtype=jnp.float32)

            def body(i, a):
                # non-hoistable, carry-dependent modulation (CLAUDE.md #21)
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

    def timed(fn, iters=10, name=""):
        acc = fn(jnp.float32(0.0), prepped)
        _ = np.asarray(acc)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc = fn(acc, prepped)
        _ = np.asarray(acc)
        dt = (time.perf_counter() - t0) / iters
        log(f"{name}: {dt * 1e3:.3f} ms")
        return dt

    report = {"shape": f"({bb}, {t_frames} frames)", "flops": fflops,
              "marginal_us": {}}
    for cname in ("full", "slice"):
        report["marginal_us"][cname] = {}
        for fname, fn in forms.items():
            try:
                t_lo = timed(make_loop(fn, 2, cname),
                             name=f"{fname}/{cname} x2")
                t_hi = timed(make_loop(fn, 10, cname),
                             name=f"{fname}/{cname} x10")
                marg = (t_hi - t_lo) / 8
                report["marginal_us"][cname][fname] = marg * 1e6
                log(f"=> {fname}/{cname} marginal: {marg*1e6:.1f} us "
                    f"({fflops / marg / 1e12:.1f} nominal TF)")
            except Exception as e:  # noqa: BLE001
                report["marginal_us"][cname][fname] = None
                log(f"=> {fname}/{cname} FAILED: {type(e).__name__}: {e}")

    # on-chip parity of every form vs the f32 conv path
    @jax.jit
    def parity(w):
        mel_a, lin_a = conv_xla(w)
        out = {}
        for fname, fn in forms.items():
            if fname == "conv_xla":
                continue
            mel_b, lin_b = fn(w)
            out[fname] = jnp.maximum(jnp.max(jnp.abs(mel_a - mel_b)),
                                     jnp.max(jnp.abs(lin_a - lin_b)))
        return out

    report["parity_vs_conv_f32"] = {
        k: float(v) for k, v in jax.device_get(parity(prepped)).items()}
    log("parity:", report["parity_vs_conv_f32"])

    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
