#!/bin/bash
# Launches the continuous FID/IS evaluation service against a training
# workdir (parity with reference test.sh). Usage:
#   scripts/test.sh <experiment_name> [extra flags...]
set -eu
EXP_NAME="${1:?usage: test.sh <experiment_name> [flags...]}"
shift || true
WORK_DIR="${WORK_DIR:-exp/${EXP_NAME}}"
python -m xmcgan_image_generation_tpu.main \
  --config="${CONFIG:-xmcgan_image_generation_tpu/configs/coco_xmc.py}" \
  --workdir="${WORK_DIR}" \
  --mode=test "$@"
