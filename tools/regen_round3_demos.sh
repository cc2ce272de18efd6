#!/bin/bash
# Regenerate ALL round-3 trained evidence from scratch (VERDICT r2 #5:
# "every number in BENCH_trained_r0N.json regenerable from the repo").
#
# Produces, under $WORK (default /root/tpu_work/round3 — NOT /tmp, which
# does not survive a sandbox restart):
#   patterns/           synthetic 256-utterance corpus, --store-wav
#   flagship/           gst_lj + guided attention, 30k steps (device corpus)
#   flagship_noga/      gst_lj WITHOUT guided attention, 8k steps (control)
#   vocoder/            WaveRNN 20k steps on the same corpus
# then synthesizes the demo artifacts into demo/round3*/ and runs
# `python bench.py --trained` against the flagship workdir.
#
# Runtime on one v5e chip: ~25 min end-to-end (device-corpus train path,
# ~45 true steps/s at B=16). Usage:
#   PYTHONPATH=.:/root/.axon_site bash tools/regen_round3_demos.sh
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${WORK:-/root/tpu_work/round3}"
STEPS_FLAGSHIP="${STEPS_FLAGSHIP:-30000}"
STEPS_CONTROL="${STEPS_CONTROL:-8000}"
STEPS_VOCODER="${STEPS_VOCODER:-20000}"
mkdir -p "$WORK"

COMMON_DATA="data.wav_transport=true data.device_corpus=true data.batch_size=16"

if [ ! -f "$WORK/patterns/metadata.json" ]; then
  python -m gst_tacotron_tpu.data.pattern --corpus synthetic \
    --out "$WORK/patterns" --num-utterances 256 --workers 4 --store-wav \
    --config configs/gst_lj.json
fi

# Flagship WITH the guided-attention prior (VERDICT r2 #4: no driver config
# whose demo shows 0.17 diagonality).
python -m gst_tacotron_tpu.train --preset gst_lj \
  --patterns "$WORK/patterns" --workdir "$WORK/flagship" \
  --steps "$STEPS_FLAGSHIP" \
  $COMMON_DATA loss.guided_attention_weight=0.3 train.eval_every=2000

# Control: same corpus/steps budget, guided attention OFF — isolates the
# prior's effect from the corpus.
python -m gst_tacotron_tpu.train --preset gst_lj \
  --patterns "$WORK/patterns" --workdir "$WORK/flagship_noga" \
  --steps "$STEPS_CONTROL" \
  $COMMON_DATA train.eval_every=2000

# Vocoder (config 5) on the same corpus.
python -m gst_tacotron_tpu.vocoder_train --preset gst_wavernn \
  --patterns "$WORK/patterns" --workdir "$WORK/vocoder" \
  --steps "$STEPS_VOCODER"

# Demo artifacts (committed; the checkpoints stay in $WORK).
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round3 --chunked-decoder \
  --texts "Scientists at the CERN laboratory say they have discovered a new particle." \
          "The quick brown fox jumps over the lazy dog."

# Style-control demo (replaces the never-committed round-2 artifacts —
# ROUND2_NOTES correction): two one-hot token weightings of the same text.
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round3_style --chunked-decoder \
  --token-weights 1,0,0,0,0,0,0,0,0,0 \
  --texts "style tokens shape the voice."
for f in demo/round3_style/synth_000.wav demo/round3_style/synth_000_align.png; do
  [ -f "$f" ] && mv "$f" "${f/synth_000/token0}"
done
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round3_style --chunked-decoder \
  --token-weights 0,0,0,0,0,1,0,0,0,0 \
  --texts "style tokens shape the voice."
for f in demo/round3_style/synth_000.wav demo/round3_style/synth_000_align.png; do
  [ -f "$f" ] && mv "$f" "${f/synth_000/token5}"
done

# Neural-vocoded sample (config-5 chain).
python -m gst_tacotron_tpu.synthesize --workdir "$WORK/flagship" \
  --out demo/round3_vocoder --chunked-decoder \
  --vocoder wavernn --vocoder-workdir "$WORK/vocoder" \
  --texts "the neural vocoder renders this sentence."

cp "$WORK/flagship/logs/metrics.jsonl" demo/round3/train_metrics.jsonl
cp "$WORK/flagship_noga/logs/metrics.jsonl" demo/round3/control_noga_metrics.jsonl

python bench.py --checkpoint "$WORK/flagship" \
  --details BENCH_trained_r03_details.json > BENCH_trained_r03.json || true
echo "regen complete; artifacts in demo/round3*, bench in BENCH_trained_r03.json"
