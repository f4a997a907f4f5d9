#!/bin/bash
# Round-5 512px quality run (VERDICT r4 #6): train the 512px operating
# point found by the sweep (b4/T8 + full remat, no LPIPS remat —
# artifacts/round5_512/sweep.jsonl) properly: 6000 one-cycle steps on the
# 8-video 512px synthetic fixture (.data512, 40 frames/video), resident
# corpus staging, then the quantitative + cross-identity evals.
# Usage: bash scripts/round5_512_quality.sh
set -eu
DATA=.data512
OUT=artifacts/round5_512
mkdir -p "$OUT"

if [ ! -d "$DATA/video_000" ]; then
  python -c "
from faceoff_tpu.data import synthetic
synthetic.generate_dataset('$DATA', n_videos=8, n_frames=40, size=512)"
fi

python -m faceoff_tpu.cli.train_faceoff_perceptual \
  --data_root "$DATA" --size 512 --batch_size 4 \
  --train_frames 8 --val_frames 8 \
  --remat --resident_data --resident_hbm_budget_gib 4 \
  --sched cycle --lr 3e-4 --epoch 3000 --validate_at 1500 \
  --colorjit const \
  --checkpoint_dir "$OUT/ckpt" \
  --sample_folder "$OUT/samples" \
  --metrics_path "$OUT/metrics.jsonl" \
  --stall_timeout 2400 \
  --ckpt latest \
  2>&1 | tee -a "$OUT/train.log"

python -m faceoff_tpu.cli.evaluate \
  --data_root "$DATA" --size 512 --frames 8 \
  --checkpoint_dir "$OUT/ckpt" --ckpt latest --remat \
  > "$OUT/eval.json" 2> "$OUT/eval.log"

python -m faceoff_tpu.cli.evaluate \
  --data_root "$DATA" --size 512 --frames 8 \
  --checkpoint_dir "$OUT/ckpt" --ckpt latest --remat \
  --crossid --naive_baseline paste \
  > "$OUT/eval_crossid.json" 2> "$OUT/eval_crossid.log"

echo "QUALITY RUN DONE"
cat "$OUT/eval.json" "$OUT/eval_crossid.json"
