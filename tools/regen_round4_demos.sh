#!/bin/bash
# Regenerate ALL round-4 trained evidence from scratch (VERDICT r3 items
# 3/4/7: scale-realistic corpus, config-5 number, quantified style control).
#
# Produces, under $WORK (default /root/tpu_work/round4 — NOT /tmp, which
# does not survive a sandbox restart):
#   patterns13k/        synthetic 13,000-utterance VARIABLE-LENGTH corpus
#                       (unique word-sequence sentences, ~12-170 chars, all
#                       three gst_lj buckets occupied), wav-only shards
#   flagship/           gst_lj + guided attention, 30k steps, per-bucket
#                       device corpus (HBM GB printed at trainer startup)
#   vocoder/            WaveRNN 20k steps on the same corpus
# then synthesizes demo artifacts into demo/round4*/, quantifies style
# control (demo/round4/style_contrast.json), and runs the trained bench.
#
# Usage:
#   PYTHONPATH=.:/root/.axon_site bash tools/regen_round4_demos.sh
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${WORK:-/root/tpu_work/round4}"
STEPS_FLAGSHIP="${STEPS_FLAGSHIP:-30000}"
STEPS_VOCODER="${STEPS_VOCODER:-20000}"
mkdir -p "$WORK" demo/round4

COMMON_DATA="data.wav_transport=true data.device_corpus=true data.batch_size=16"

if [ ! -f "$WORK/patterns13k/metadata.json" ]; then
  python -m gst_tacotron_tpu.data.pattern --corpus synthetic \
    --out "$WORK/patterns13k" --num-utterances 13000 --workers 4 \
    --variable-lengths --wav-only --config configs/gst_lj.json
fi

# Flagship on the 13k-utterance corpus (the r3 flagship trained on 16
# recycled sentences — closer to memorization than corpus training).
python -m gst_tacotron_tpu.train --preset gst_lj \
  --patterns "$WORK/patterns13k" --workdir "$WORK/flagship" \
  --steps "$STEPS_FLAGSHIP" \
  $COMMON_DATA loss.guided_attention_weight=0.3 train.eval_every=2000 \
  2>&1 | tee "$WORK/flagship_train.log" | grep -E "trainer|loader|eval|[0-9]000 " || true

# Vocoder (config 5) on the same corpus (wav-only shards store the wavs).
python -m gst_tacotron_tpu.vocoder_train --preset gst_wavernn \
  --patterns "$WORK/patterns13k" --workdir "$WORK/vocoder" \
  --steps "$STEPS_VOCODER"

# Demo artifacts (committed; the checkpoints stay in $WORK).
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round4 --chunked-decoder \
  --texts "Scientists at the CERN laboratory say they have discovered a new particle." \
          "The quick brown fox jumps over the lazy dog."

# Quantified style control (VERDICT r3 item 7): >=3 one-hot token weights +
# a reference-wav condition vs the seed-noise floor, committed as JSON.
python tools/style_contrast.py --workdir "$WORK/flagship" \
  --out demo/round4/style_contrast.json

# Neural-vocoded sample (config-5 chain).
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round4_vocoder --chunked-decoder \
  --vocoder wavernn --vocoder-workdir "$WORK/vocoder" \
  --texts "the neural vocoder renders this sentence."

cp "$WORK/flagship/logs/metrics.jsonl" demo/round4/train_metrics.jsonl

# Trained bench (real stop-token termination, B=32 default).
python bench.py --checkpoint "$WORK/flagship" \
  --details BENCH_trained_r04_details.json > BENCH_trained_r04.json || true

# Config-5 pipeline number (batch 8: the Mosaic decode kernel it uses must
# not be compiled at B>8 — see CLAUDE.md #8/#14).
python bench.py --batch 8 --config5 --no-pallas-pipeline \
  --details BENCH_config5_r04.json > /dev/null || true
echo "regen complete; artifacts in demo/round4*, bench in BENCH_trained_r04.json"
