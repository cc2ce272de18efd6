#!/bin/bash
# Regenerate ALL round-5 trained evidence from scratch on one chip (VERDICT
# r4 items 4/6/7/8: fresh on-chip test log, config-5 at the measured stream
# optimum with the trained vocoder, decisive style-contrast floor, and a
# config-3 alignment stress on a corpus where diagonality can actually fail).
#
# Produces, under $WORK (default /root/tpu_work/round5 — NOT /tmp):
#   patterns13k/     13,000-utterance VARIABLE-LENGTH synthetic corpus
#                    (linear token->time mapping; flagship + vocoder corpus)
#   patterns13k_nl/  13,000-utterance NONLINEAR-DURATIONS corpus (log-uniform
#                    per-token durations + pauses) — restores discriminative
#                    power to eval/diagonality for the config-3 stress
#   flagship/        gst_lj + guided attention, 30k steps, device corpus
#   vocoder/         WaveRNN 20k steps on the same corpus
#   config3/         gst_r1_location (r=1, location-sensitive), nonlinear
#                    corpus — the SURVEY §4 "alignment stress"
# and commits-side artifacts: TPU_TEST_r05.log, demo/round5*,
# BENCH_trained_r05.json, BENCH_config5_r05.json, BENCH_config3_r05.json.
#
# Usage:
#   PYTHONPATH=.:/root/.axon_site bash tools/regen_round5_demos.sh
#
# DO NOT run under an outer `timeout`: if the deadline lands mid-remote-
# compile the kill orphans the compile server-side and wedges the device
# for its remaining duration (CLAUDE.md #8; happened once in r5 — the
# bench steps were split into tools/finish_r5_benches.sh, which also
# avoids config-3's mid-run checkpoint stall).
set -uo pipefail
cd "$(dirname "$0")/.."

WORK="${WORK:-/root/tpu_work/round5}"
STEPS_FLAGSHIP="${STEPS_FLAGSHIP:-30000}"
STEPS_VOCODER="${STEPS_VOCODER:-20000}"
STEPS_CONFIG3="${STEPS_CONFIG3:-15000}"
mkdir -p "$WORK" demo/round5

COMMON_DATA="data.wav_transport=true data.device_corpus=true data.batch_size=16"

# --- 0. On-chip compiled kernel suite (VERDICT r4 item 4: run it EVERY
#        round the kernels change; commit the log) -------------------------
python -m pytest tpu_tests -q 2>&1 | tee TPU_TEST_r05.log

# --- 1. Corpora ------------------------------------------------------------
if [ ! -f "$WORK/patterns13k/metadata.json" ]; then
  python -m gst_tacotron_tpu.data.pattern --corpus synthetic \
    --out "$WORK/patterns13k" --num-utterances 13000 --workers 4 \
    --variable-lengths --wav-only --config configs/gst_lj.json
fi
if [ ! -f "$WORK/patterns13k_nl/metadata.json" ]; then
  python -m gst_tacotron_tpu.data.pattern --corpus synthetic \
    --out "$WORK/patterns13k_nl" --num-utterances 13000 --workers 4 \
    --variable-lengths --nonlinear-durations --wav-only \
    --config configs/gst_r1_location.json
fi

# --- 2. Flagship (gst_lj, 30k) ----------------------------------------------
python -m gst_tacotron_tpu.train --preset gst_lj \
  --patterns "$WORK/patterns13k" --workdir "$WORK/flagship" \
  --steps "$STEPS_FLAGSHIP" \
  $COMMON_DATA loss.guided_attention_weight=0.3 train.eval_every=2000 \
  2>&1 | tee "$WORK/flagship_train.log" | grep -E "trainer|loader|eval|[0-9]000 " || true

# --- 3. Vocoder (config 5, WaveRNN 20k) --------------------------------------
python -m gst_tacotron_tpu.vocoder_train --preset gst_wavernn \
  --patterns "$WORK/patterns13k" --workdir "$WORK/vocoder" \
  --steps "$STEPS_VOCODER"

# --- 4. Config-3 alignment stress (r=1, location-sensitive, NONLINEAR
#        durations: tokens no longer map linearly to time, so diagonality
#        < 1.0 is achievable and the metric can fail for real reasons) ------
# checkpoint only at the end: the r=1 eval-synthesis program is huge, and
# the first r5 attempt stalled >60 min in a post-eval checkpoint-interval
# device fetch (ROUND5_NOTES.md); end-only saves avoid the window
python -m gst_tacotron_tpu.train --preset gst_r1_location \
  --patterns "$WORK/patterns13k_nl" --workdir "$WORK/config3" \
  --steps "$STEPS_CONFIG3" \
  $COMMON_DATA train.eval_every=3000 \
  "train.checkpoint_every=$STEPS_CONFIG3" \
  2>&1 | tee "$WORK/config3_train.log" | grep -E "trainer|loader|eval|[0-9]000 " || true

# --- 5. Demo artifacts -------------------------------------------------------
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round5 --chunked-decoder \
  --texts "Scientists at the CERN laboratory say they have discovered a new particle." \
          "The quick brown fox jumps over the lazy dog."

# Quantified style control, r5 methodology (deterministic-prenet primary
# pass + N-seed stochastic floor + per-condition F0/RMS/centroid stats).
python tools/style_contrast.py --workdir "$WORK/flagship" \
  --out demo/round5/style_contrast.json

# Neural-vocoded sample (config-5 chain).
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round5_vocoder --chunked-decoder \
  --vocoder wavernn --vocoder-workdir "$WORK/vocoder" \
  --texts "the neural vocoder renders this sentence."

cp "$WORK/flagship/logs/metrics.jsonl" demo/round5/train_metrics.jsonl
cp "$WORK/config3/logs/metrics.jsonl" demo/round5/config3_metrics.jsonl

# --- 6. Benches --------------------------------------------------------------
# Trained flagship (real stop-token termination, B=32 monolithic program).
python bench.py --checkpoint "$WORK/flagship" \
  --details BENCH_trained_r05_details.json > BENCH_trained_r05.json || true

# Config-5 pipeline at the measured stream optimum (VERDICT r4 item 6):
# decode tiled 4x8, WaveRNN samples all 32 streams in one launch, TRAINED
# vocoder weights.
python bench.py --batch 32 --config5 --no-pallas-pipeline \
  --vocoder-workdir "$WORK/vocoder" \
  --details BENCH_config5_r05.json > /dev/null || true

# Trained config-3 row (r=1 location-sensitive; B=8 — its decode uses the
# Pallas LSA kernel, which must not compile at B>8, CLAUDE.md #14).
python bench.py --batch 8 --checkpoint "$WORK/config3" \
  --details BENCH_config3_r05.json > /dev/null || true

echo "regen complete; artifacts in demo/round5*, TPU_TEST_r05.log, BENCH_*_r05.json"
