#!/usr/bin/env bash
# Canonical depth training (reference script/train_sd21_main_paper/)
set -e
CKPT=${1:?base sd2.1 checkpoint}
OUT=${2:?output dir}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
python -m genpercept_tpu.cli.train --config configs/train/depth.yaml \
    --checkpoint "$CKPT" --base_data_dir "$BASE_DATA_DIR" --output_dir "$OUT"
