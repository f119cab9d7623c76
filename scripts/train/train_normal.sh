#!/usr/bin/env bash
# Main-paper normal training recipe on a TPU mesh (reference
# script/train_sd21_main_paper/; accelerate launch -> jax mesh)
set -e
CKPT=${1:?base SD2.1 checkpoint dir}
OUT=${2:-runs/normal}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
python -m genpercept_tpu.cli.train \
    --config configs/train/main_paper/normal.yaml \
    --checkpoint "$CKPT" \
    --base_data_dir "$BASE_DATA_DIR" \
    --output_dir "$OUT" "${@:3}"
