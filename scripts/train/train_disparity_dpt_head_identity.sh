#!/usr/bin/env bash
# Main-paper disparity_dpt_head_identity training recipe on a TPU mesh (reference
# script/train_sd21_main_paper/; accelerate launch -> jax mesh)
set -e
CKPT=${1:?base SD2.1 checkpoint dir}
OUT=${2:-runs/disparity_dpt_head_identity}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
python -m genpercept_tpu.cli.train \
    --config configs/train/main_paper/disparity_dpt_head_identity.yaml \
    --checkpoint "$CKPT" \
    --base_data_dir "$BASE_DATA_DIR" \
    --output_dir "$OUT" "${@:3}"
