#!/usr/bin/env bash
# (reference script/eval_sd21/eval_ensemble1_step1/42_eval_scannet.sh)
set -e
OUT=${1:-output_eval/eval}
ALIGN=${2:-least_square}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
python -m genpercept_tpu.cli.eval \
    --dataset_config configs/dataset/eval/scannet.yaml \
    --base_data_dir "$BASE_DATA_DIR" \
    --prediction_dir "$OUT/scannet_test/prediction" \
    --output_dir "$OUT/scannet_test/eval_metric" \
    --alignment "$ALIGN"
