#!/bin/bash
# Remaining round-5 bench/stress steps, runnable standalone after
# regen_round5_demos.sh trained the checkpoints. Split out because the r5
# regen hit two runtime hazards mid-flight (see ROUND5_NOTES.md): the
# config-3 trainer stalled >60 min inside a checkpoint-interval device
# fetch after its huge r=1 eval-synthesis program, and the regen's outer
# `timeout` then killed a bench MID-REMOTE-COMPILE, wedging the device for
# the orphaned compile's duration (CLAUDE.md #8 worse mode).
#
# Rules encoded here: no outer timeout (never kill a TPU process
# mid-compile), one TPU process at a time, config-3 checkpoints only at
# the end of the run.
#
# Usage: PYTHONPATH=.:/root/.axon_site bash tools/finish_r5_benches.sh
set -uo pipefail
cd "$(dirname "$0")/.."
WORK="${WORK:-/root/tpu_work/round5}"
STEPS_CONFIG3="${STEPS_CONFIG3:-15000}"

# 1. Trained flagship bench (real stop-token termination, B=32).
python bench.py --checkpoint "$WORK/flagship" \
  --details BENCH_trained_r05_details.json > BENCH_trained_r05.json || true
cat BENCH_trained_r05.json

# 2. Config-5 at the measured stream optimum with the TRAINED vocoder.
python bench.py --batch 32 --config5 --no-pallas-pipeline \
  --vocoder-workdir "$WORK/vocoder" \
  --details BENCH_config5_r05.json > /dev/null || true

# 3. Config-3 stress rerun on the nonlinear corpus: checkpoint only at the
#    end (the mid-run save after the big eval-synthesis program is where
#    the first attempt stalled), eval (incl. diagonality) every 3000.
python -m gst_tacotron_tpu.train --preset gst_r1_location \
  --patterns "$WORK/patterns13k_nl" --workdir "$WORK/config3b" \
  --steps "$STEPS_CONFIG3" \
  data.wav_transport=true data.device_corpus=true data.batch_size=16 \
  train.eval_every=3000 "train.checkpoint_every=$STEPS_CONFIG3" \
  2>&1 | tee "$WORK/config3b_train.log" | grep -E "trainer|eval|steps_per_sec.*000" || true
cp "$WORK/config3b/logs/metrics.jsonl" demo/round5/config3_metrics.jsonl

# 4. Trained config-3 bench row (B=8: Pallas LSA decode kernel ceiling).
python bench.py --batch 8 --checkpoint "$WORK/config3b" \
  --details BENCH_config3_r05.json > /dev/null || true

echo "finish_r5 complete"
