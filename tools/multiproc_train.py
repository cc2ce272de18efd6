"""Real 2-process `jax.distributed` training run with loss parity asserted
against the single-process run (SURVEY.md §2.3 "Communication backend";
BASELINE "N>=2 hosts").

Everything distributed in rounds 1-3 ran inside ONE process on virtual
devices, where GSPMD never crosses a process boundary. This tool executes
the actual multi-host code path end to end, on this sandbox's CPU backend
(cross-process collectives ride Gloo — verified working here):

  * `parallel.mesh.initialize_distributed` via the production train CLI's
    `--coordinator/--num-processes/--process-id` flags,
  * the loader's global-batch-plan sharding (each process assembles only its
    contiguous slice of every global batch),
  * `shard_batch`'s `make_array_from_process_local_data` path,
  * state replication across processes (`parallel.replicate_tree`),
  * cross-process gradient psums inserted by GSPMD for every train step,
  * the orbax checkpoint written cooperatively by both processes.

Protocol: generate a synthetic corpus once; run the SAME tiny GST config
(a) as 1 process x 2 virtual devices and (b) as 2 processes x 1 virtual
device each (same 2-way global data mesh, same global batches — the
loader's global plan is shard-count-invariant by construction). The per-step
loss trajectories must match to float tolerance: the only difference between
the runs is which process executes which shard and that gradient reductions
cross a process boundary.

Usage: python tools/multiproc_train.py [--steps 100] [--out MULTIPROC_r04.log]
Runs entirely on CPU; safe to run alongside TPU work.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 12421

TINY = {
    "audio.n_fft": 512,
    "audio.hop_length": 128,
    "audio.win_length": 512,
    "audio.griffin_lim_iters": 4,
    "model.num_freq": 257,
    "model.encoder.embedding_dim": 64,
    "model.encoder.prenet_dims": [64, 32],
    "model.encoder.cbhg_bank_k": 4,
    "model.encoder.cbhg_bank_channels": 32,
    "model.encoder.cbhg_proj_channels": [32, 32],
    "model.encoder.cbhg_highway_layers": 2,
    "model.encoder.cbhg_highway_dim": 32,
    "model.encoder.cbhg_gru_dim": 32,
    "model.gst.ref_conv_channels": [8, 16, 32],
    "model.gst.ref_gru_dim": 32,
    "model.gst.style_dim": 32,
    "model.attention.dim": 32,
    "model.decoder.prenet_dims": [64, 32],
    "model.decoder.attention_rnn_dim": 32,
    "model.decoder.decoder_rnn_dim": 32,
    "model.decoder.max_decode_steps": 10,
    "model.postnet.cbhg_bank_k": 2,
    "model.postnet.cbhg_bank_channels": 16,
    "model.postnet.cbhg_proj_channels": [32, 80],
    "model.postnet.cbhg_highway_layers": 1,
    "model.postnet.cbhg_highway_dim": 32,
    "model.postnet.cbhg_gru_dim": 32,
    "data.batch_size": 16,          # GLOBAL batch (loader shards it)
    "data.buckets": [[128, 1024]],
    "data.val_fraction": 0.0,
    "train.log_every": 1,           # per-step loss for the parity assert
    "train.checkpoint_every": 10_000,
    "train.eval_every": 10_000,
}


def make_corpus_and_config(root: str) -> tuple:
    """Synthetic corpus + resolved config JSON, shared by all runs."""
    from gst_tacotron_tpu.config import apply_overrides, get_preset, save_config
    from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances

    cfg = apply_overrides(get_preset("gst_lj"), TINY)
    pattern_dir = os.path.join(root, "patterns")
    generate_patterns(synthetic_utterances(64, num_speakers=1),
                      cfg.audio, pattern_dir)
    cfg_path = os.path.join(root, "config.json")
    save_config(cfg, cfg_path)
    return pattern_dir, cfg_path


def run_cli(workdir, pattern_dir, cfg_path, steps, devices_per_proc,
            rank=None, num_processes=None, model_parallelism=1):
    """One training process through the PRODUCTION CLI (train.main)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "gst_tacotron_tpu.train",
        "--config", cfg_path, "--patterns", pattern_dir,
        "--workdir", workdir, "--steps", str(steps),
    ]
    if model_parallelism > 1:
        cmd += ["--model-parallelism", str(model_parallelism)]
    if num_processes is not None:
        # pin each rank to disjoint cores: Gloo busy-polls its sockets, and
        # unpinned ranks thrash each other on this 4-core host (measured
        # 28-90 s/step unpinned vs seconds pinned)
        half = max(1, os.cpu_count() // num_processes)
        cores = f"{rank * half}-{rank * half + half - 1}"
        cmd = ["taskset", "-c", cores] + cmd
        cmd += ["--coordinator", f"127.0.0.1:{PORT}",
                "--num-processes", str(num_processes),
                "--process-id", str(rank)]
    return subprocess.Popen(cmd, env=env, cwd=REPO, text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def read_losses(workdir):
    path = os.path.join(workdir, "logs", "metrics.jsonl")
    out = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                out[rec["step"]] = rec["train/loss"]
    return out


def run_mode(root, pattern_dir, cfg_path, steps, mode):
    """One parity experiment: run A (1 process, 2 virtual devices) vs run B
    (2 processes x 1 device, same 2-device global mesh, collectives over
    Gloo). mode selects which axis spans the two devices:

      * "dp": mesh (data=2, model=1) — every GRADIENT psum crosses the
        process boundary in run B (the r4 experiment).
      * "tp": mesh (data=1, model=2) — the TENSOR-PARALLEL collectives
        (style-token attention / decoder-projection / embedding matmuls
        sharded over `model`, plus the psums GSPMD inserts for their
        activations and gradients) cross the process boundary in run B;
        both ranks load the identical replicated global batch
        (parallel.process_data_shard). This was the one SURVEY §2.3 path
        with zero executed evidence through round 4 (VERDICT r4 item 5).

    1 device per process is the configuration where EVERY collective of the
    axis under test crosses a process boundary, and the cheap one: Gloo's
    per-step cost scales hard with participant count on this 4-core host
    (measured 6.7 s/step at 2x1 vs 21.6 s/step at 2x2, r4).
    """
    import numpy as np

    mp = 2 if mode == "tp" else 1
    section = {"mode": mode, "model_parallelism": mp,
               "mesh": "(data=1, model=2)" if mode == "tp"
                       else "(data=2, model=1)"}

    # ---- run A: single process, 2 virtual devices ---------------------------
    w1 = os.path.join(root, f"{mode}_single")
    t0 = time.time()
    pa = run_cli(w1, pattern_dir, cfg_path, steps, devices_per_proc=2,
                 model_parallelism=mp)
    out_a, _ = pa.communicate(timeout=7200)
    section["single_process"] = {
        "rc": pa.returncode, "wall_s": round(time.time() - t0, 1),
        "devices": 2, "processes": 1,
    }
    print(f"[multiproc:{mode}] single-process run rc={pa.returncode} "
          f"({section['single_process']['wall_s']}s)")
    if pa.returncode != 0:
        print(out_a[-4000:])
        sys.exit(1)

    # ---- run B: 2 processes x 1 device, same 2-way global mesh --------------
    w2 = os.path.join(root, f"{mode}_multi")
    t0 = time.time()
    procs = [
        run_cli(w2, pattern_dir, cfg_path, steps, devices_per_proc=1,
                rank=r, num_processes=2, model_parallelism=mp)
        for r in range(2)
    ]
    outs = []
    for r, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=7200)
        outs.append(out)
    section["two_process"] = {
        "rc": [p.returncode for p in procs],
        "wall_s": round(time.time() - t0, 1),
        "devices": 2, "processes": 2, "devices_per_process": 1,
        "coordinator": f"127.0.0.1:{PORT}",
    }
    print(f"[multiproc:{mode}] 2-process run rcs={section['two_process']['rc']} "
          f"({section['two_process']['wall_s']}s)")
    if any(p.returncode != 0 for p in procs):
        for r, out in enumerate(outs):
            print(f"--- rank {r} tail ---\n{out[-4000:]}")
        sys.exit(1)

    # ---- parity ------------------------------------------------------------
    la, lb = read_losses(w1), read_losses(w2)
    steps_seen = sorted(set(la) & set(lb))
    assert len(steps_seen) >= steps - 1, (len(la), len(lb))
    a = np.array([la[s] for s in steps_seen])
    b = np.array([lb[s] for s in steps_seen])
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-9)
    section["loss_parity"] = {
        "compared_steps": len(steps_seen),
        "max_rel_diff": float(rel.max()),
        "mean_rel_diff": float(rel.mean()),
        "first_step_loss": [float(a[0]), float(b[0])],
        "last_step_loss": [float(a[-1]), float(b[-1])],
        "loss_decreased": bool(a[-1] < a[0] and b[-1] < b[0]),
    }
    # measured 2.7e-7 max on the first executed run; 1e-4 leaves margin for
    # reduction-order noise while still proving step-for-step equivalence
    section["parity_ok"] = bool(rel.max() < 1e-4)
    # gloo log lines prove collectives actually crossed the process boundary
    gloo = [l for l in outs[0].splitlines() if "Gloo" in l][:4]
    section["gloo_evidence_rank0"] = gloo

    if mode == "tp":
        # prove the params were actually TP-sharded in run B: the trainer
        # prints the describe_sharding summary lines (see train.py)
        tp_lines = [l for l in outs[0].splitlines() if "model" in l
                    and "shard" in l.lower()][:4]
        section["tp_sharding_evidence_rank0"] = tp_lines

    # checkpoint written cooperatively into the SHARED workdir
    ckpt_dir = os.path.join(w2, "checkpoints")
    section["shared_checkpoint"] = {
        "dir": ckpt_dir,
        "steps": sorted(
            int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
        ) if os.path.isdir(ckpt_dir) else [],
    }
    # this sandbox's XLA:CPU spews multi-KB AOT host-feature warnings that
    # would otherwise be the entire tail — filter before excerpting
    section["rank0_tail"] = [
        l for l in outs[0].splitlines()
        if "cpu_aot_loader" not in l and "machine features" not in l
    ][-20:]
    return section


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--modes", default="dp,tp",
                   help="comma list of parity experiments to run (dp, tp)")
    p.add_argument("--out", default=os.path.join(REPO, "MULTIPROC_r05.log"))
    p.add_argument("--keep-root", help="work root (default: a tmp dir)")
    args = p.parse_args()

    root = args.keep_root or tempfile.mkdtemp(prefix="gst_multiproc_")
    os.makedirs(root, exist_ok=True)
    print(f"[multiproc] work root: {root}")
    pattern_dir, cfg_path = make_corpus_and_config(root)

    report = {
        "tool": "tools/multiproc_train.py",
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "steps": args.steps,
        "global_batch": TINY["data.batch_size"],
        "backend": "cpu (XLA host platform), cross-process collectives via "
                   "Gloo through jax.distributed",
        "sections": [],
    }
    ok = True
    for mode in args.modes.split(","):
        section = run_mode(root, pattern_dir, cfg_path, args.steps,
                           mode.strip())
        report["sections"].append(section)
        ok = ok and section["parity_ok"]
        print(f"[multiproc:{mode}] parity_ok={section['parity_ok']} "
              f"max_rel_diff={section['loss_parity']['max_rel_diff']:.2e}")

    report["parity_ok"] = ok
    with open(args.out, "w") as f:
        f.write("# MULTIPROC — real 2-process jax.distributed training runs\n")
        f.write("# dp: gradient psums cross the process boundary "
                "(VERDICT r3 item 1)\n")
        f.write("# tp: tensor-parallel collectives cross the process "
                "boundary (VERDICT r4 item 5)\n")
        f.write(json.dumps(report, indent=2) + "\n")
    print(f"[multiproc] parity_ok={ok}; report -> {args.out}")
    if not args.keep_root:
        shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
