#!/bin/bash
# Launches training (parity with reference train.sh). Usage:
#   scripts/train.sh <experiment_name> [extra flags...]
# On TPU there is no GPU pinning to do: train and eval jobs run on
# separate hosts/slices, each seeing its own jax.devices().
set -eu
EXP_NAME="${1:?usage: train.sh <experiment_name> [flags...]}"
shift || true
WORK_DIR="${WORK_DIR:-exp/${EXP_NAME}}"
python -m xmcgan_image_generation_tpu.main \
  --config="${CONFIG:-xmcgan_image_generation_tpu/configs/coco_xmc.py}" \
  --workdir="${WORK_DIR}" \
  --mode=train "$@"
