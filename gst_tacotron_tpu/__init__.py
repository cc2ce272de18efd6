"""gst_tacotron_tpu — a TPU-native expressive-TTS framework (GST-Tacotron family).

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
CODEJIN/GST_Tacotron (reference mount empty at build time; capability spec is
/root/repo/SURVEY.md + BASELINE.json). Nothing here is a port: the compute path
is jit/scan/shard_map over a device mesh, the hot DSP ops are Pallas kernels
with pure-jnp fallbacks, and the runtime (data loading, checkpointing,
metrics) is grain/orbax/clu-style.

Layer map (mirrors SURVEY.md §1):
  dsp/       — L1 audio DSP (STFT, mel, Griffin-Lim) with numpy reference + JAX impl
  text/      — L2 text frontend (cleaners, tokenizer)
  data/      — L2/L3 offline pattern prep + bucketed host loader
  models/    — L4 flax modules (CBHG, GST, attention, AR decoder as lax.scan)
  ops/       — Pallas TPU kernels for the named hot paths
  parallel/  — mesh factory, sharding rules, collectives for distributed decode
  train.py   — L5 trainer (jit train step, orbax ckpt, metrics)
  synthesize.py — L5/L6 inference path (fused decode scan + vocoder)
"""

__version__ = "0.1.0"
