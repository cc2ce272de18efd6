"""Round-5 ref-encoder floor attribution probe (VERDICT r4 item 3).

KERNEL_BENCH_r05 measures the batched-bf16 ref-encoder kernel at ~207 us
for (8, 256, 80) — 0.13x of its own 27.9 us bf16 design-FLOP compute floor.
This probe attributes the remaining gap so the floor claim can be retired
with data (the Bahdanau-mega-kernel treatment) or acted on:

  * full_b8   — production form: batched-bf16 stack + Pallas GRU tail, B=8
  * stack_b8  — the conv-stack kernel alone (no GRU, no glue)
  * gru_b8    — the GRU tail alone on stack-shaped features (T'=4 steps)
  * xla_chain — the IDENTICAL computation (same phase matrices, same
    stride-2 row phases, same bf16 operands, same 6-layer dependency
    structure) written in plain XLA. If XLA's own scheduler lands at the
    same wall, the kernel is at the structural latency floor of this
    formulation and the remaining distance-to-compute-floor is the
    dependent layer chain, not kernel inefficiency.

(A full_b32 form was tried first: compiling the batched kernel at B=32
kills the PJRT client outright — no Python traceback, exit 1 — the same
B>=16 Mosaic-compile hazard family as the decode mega-kernel, CLAUDE.md
#14. Batch scaling is therefore probed only through the XLA twin.)

Methodology per CLAUDE.md #21 (all r5 rules): in-program fori_loop
marginals, non-separable carry modulation `x*(1+1e-12*cos((1+a)*ramp))`,
full-output checksums, forms interleaved round-robin with per-cycle
marginals, median + IQR reported.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print("[refenc-probe]", *a, file=sys.stderr, flush=True)


def main():
    from gst_tacotron_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from gst_tacotron_tpu.config import get_preset
    from gst_tacotron_tpu.models.gst import ReferenceEncoder
    from gst_tacotron_tpu.ops.gru_pallas import gru_scan_pallas
    from gst_tacotron_tpu.ops.refenc_pallas import (
        _stride2_slice,
        build_refenc_bmats,
        fold_bn,
        ref_encoder_pallas,
        refenc_stack_pallas_batched,
    )
    from gst_tacotron_tpu.utils.flatten import FlatTree

    cfg = get_preset("gst_lj")
    gst = cfg.model.gst
    n_layers = len(gst.ref_conv_channels)
    refenc = ReferenceEncoder(gst, cfg.model.num_mels)
    rng = np.random.default_rng(0)

    t_in, f_in = 256, cfg.model.num_mels
    mel8 = jnp.asarray(rng.random((8, t_in, f_in)), jnp.float32)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rv = refenc.init(jax.random.PRNGKey(0), np.zeros((1, t_in, f_in),
                                                         np.float32),
                         train=False)
    rv = jax.device_get(rv)
    fp = FlatTree(rv)

    # GRU-tail input shape: T' = T / 2**n_layers, feat dim = F' * C_last
    tp = t_in // (2 ** n_layers)
    fdim = f_in
    for _ in range(n_layers):
        fdim = (fdim + 1) // 2
    fdim *= gst.ref_conv_channels[-1]
    feats8 = jnp.asarray(rng.random((8, tp, fdim)), jnp.float32)
    log(f"gru tail shape: (8, {tp}, {fdim})")

    def stack_only(v, x):
        p, bs = v["params"], v["batch_stats"]
        kernels = [p[f"conv_{i}"]["kernel"] for i in range(n_layers)]
        scales, biases = [], []
        for i in range(n_layers):
            sc, bi = fold_bn(p[f"bn_{i}"], bs[f"bn_{i}"])
            scales.append(sc)
            biases.append(bi)
        return refenc_stack_pallas_batched(x, kernels, scales, biases,
                                           bf16=True)

    def gru_only(v, x):
        g = v["params"]["gru"]
        _, final = gru_scan_pallas(
            x, jnp.zeros((x.shape[0], g["recurrent_kernel"].shape[0]),
                         jnp.float32),
            g["kernel"].astype(jnp.float32), g["bias"].astype(jnp.float32),
            g["recurrent_kernel"].astype(jnp.float32),
            g["recurrent_bias"].astype(jnp.float32))
        return final

    def xla_chain(v, x):
        """The batched kernel's exact computation in plain XLA: same phase
        matrices (built traceably, loop-invariant — hoisted, like the
        kernel's own M-build), same stride-2 phase slices, bf16 operands,
        f32 accumulate, same ReLU/mask epilogues."""
        p, bs = v["params"], v["batch_stats"]
        kernels = [p[f"conv_{i}"]["kernel"] for i in range(n_layers)]
        scales, biases = [], []
        for i in range(n_layers):
            sc, bi = fold_bn(p[f"bn_{i}"], bs[f"bn_{i}"])
            scales.append(sc)
            biases.append(bi)
        mats, plan = build_refenc_bmats(kernels, scales, biases, t_in, f_in)
        b = x.shape[0]
        lp0 = plan[0]
        xx = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), (0, lp0["hp_in"] - t_in),
                      (0, lp0["wp_in"] - f_in)))
        xx = xx.reshape(b * lp0["hp_in"], lp0["wp_in"])
        for li, lp in enumerate(plan):
            m0, m1, m2, sv, bv = mats[li]
            xp = jnp.pad(xx, ((0, 8), (0, 0))).astype(jnp.bfloat16)
            n_rows = b * lp["hp_out"]
            acc = None
            for di, m in enumerate((m0, m1, m2)):
                rows = _stride2_slice(xp, di, n_rows, 0)
                part = jnp.dot(rows, m.astype(xp.dtype),
                               preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            y = jnp.maximum(acc * sv + bv, 0.0)
            r_idx = jnp.arange(n_rows)[:, None]
            pos = r_idx - (r_idx // lp["hp_out"]) * lp["hp_out"]
            xx = y * (pos < lp["h_out"]).astype(jnp.float32)
        return xx

    forms = {
        "full_b8": (mel8, lambda v, x: ref_encoder_pallas(
            v["params"], v["batch_stats"], gst, x, batched=True, bf16=True)),
        "stack_b8": (mel8, stack_only),
        "gru_b8": (feats8, gru_only),
        "xla_chain_b8": (mel8, xla_chain),
    }

    def make_loop(inp, fn, n):
        @jax.jit
        def f(acc, rflat, x):
            v = fp.unpack(rflat)
            ramp = jnp.arange(x.shape[-1], dtype=jnp.float32) \
                * (1.0 / x.shape[-1])

            def body(i, a):
                xi = x * (1.0 + 1e-12 * jnp.cos((1.0 + a) * ramp))
                out = fn(v, xi)
                return a + jnp.sum(out) * 1e-9
            return acc * 1e-9 + jax.lax.fori_loop(0, n, body,
                                                  jnp.float32(0.0))
        return f

    N_LO, N_HI, CYCLES, ITERS = 2, 18, 9, 8

    def timed(fn, inp, iters):
        acc = fn(jnp.float32(0.0), fp.flat, inp)
        _ = np.asarray(acc)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc = fn(acc, fp.flat, inp)
        _ = np.asarray(acc)
        return (time.perf_counter() - t0) / iters

    loops = {}
    for k, (inp, fn) in forms.items():
        loops[k] = (inp, make_loop(inp, fn, N_LO), make_loop(inp, fn, N_HI))
        _ = np.asarray(loops[k][1](jnp.float32(0.0), fp.flat, inp))
        _ = np.asarray(loops[k][2](jnp.float32(0.0), fp.flat, inp))
        log(f"compiled {k}")

    per_form = {k: [] for k in forms}
    for cyc in range(CYCLES):
        for k, (inp, flo, fhi) in loops.items():
            t_lo = timed(flo, inp, ITERS)
            t_hi = timed(fhi, inp, ITERS)
            per_form[k].append((t_hi - t_lo) / (N_HI - N_LO))
        log(f"cycle {cyc}: " + "  ".join(
            f"{k}={per_form[k][-1]*1e6:.0f}" for k in forms))

    report = {"t_in": t_in, "f_in": f_in, "gru_tail_steps": tp,
              "n_lo": N_LO, "n_hi": N_HI, "cycles": CYCLES, "iters": ITERS,
              "marginal_us": {}, "iqr_us": {}, "cycles_us": {}}
    for k, ms in per_form.items():
        med = statistics.median(ms)
        q = statistics.quantiles(ms, n=4)
        report["marginal_us"][k] = med * 1e6
        report["iqr_us"][k] = [q[0] * 1e6, q[2] * 1e6]
        report["cycles_us"][k] = [m * 1e6 for m in ms]
        log(f"=> {k}: median {med*1e6:.1f} us  "
            f"IQR [{q[0]*1e6:.1f}, {q[2]*1e6:.1f}]")

    stack = report["marginal_us"]["stack_b8"]
    xchain = report["marginal_us"]["xla_chain_b8"]
    report["kernel_stack_vs_xla_twin"] = stack / xchain
    report["full_minus_stack_us"] = (report["marginal_us"]["full_b8"]
                                     - stack)
    json.dump(report, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
