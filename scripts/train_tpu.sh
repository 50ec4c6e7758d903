#!/usr/bin/env bash
# Cluster launcher — the reference's script.py (SLURM sbatch, 1 GPU / 24 h
# chunks) translated to a TPU-VM/cron-friendly resumable launcher: training
# auto-resumes from the latest Orbax checkpoint (resume='l'), so rerunning
# this script continues a run exactly where it stopped.
set -euo pipefail
IMAGE_SIZE="${IMAGE_SIZE:-64}"
BATCH_SIZE="${BATCH_SIZE:-8}"
NITER="${NITER:-900000}"
VG_DIR="${VG_DIR:-data/vg}"
EXTRA="${EXTRA:-}"

exec python train.py \
  --image_size "$IMAGE_SIZE" \
  --batch_size "$BATCH_SIZE" \
  --niter "$NITER" \
  --vg_dir "$VG_DIR" \
  --resume l \
  $EXTRA
