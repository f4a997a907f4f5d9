#!/usr/bin/env bash
# Example production training launch (role of the reference's SLURM
# bash_scripts/train_videovqvae*.sh, re-targeted at a TPU VM).
#
# Single host drives all local chips through the device mesh; multi-host
# pods launch this same script on every worker (jax.distributed
# auto-initializes from the TPU environment).
set -euo pipefail

DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the preprocessed dataset}
RUN_DIR=${RUN_DIR:-runs/$(date +%Y%m%d_%H%M%S)}

mkdir -p "$RUN_DIR"

python -m faceoff_tpu.cli.train_faceoff_perceptual \
    --data_root "$DATA_ROOT" \
    --sched cycle \
    --colorjit const \
    --batch_size "${BATCH_SIZE:-1}" \
    --epoch "${EPOCHS:-560}" \
    --validate_at "${VALIDATE_AT:-1024}" \
    --device_pipeline \
    --metrics_path "$RUN_DIR/metrics.jsonl" \
    --sample_folder "$RUN_DIR/samples" \
    --checkpoint_dir "$RUN_DIR/checkpoint" \
    "$@" 2>&1 | tee -a "$RUN_DIR/train.log"
