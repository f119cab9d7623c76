#!/usr/bin/env bash
# (reference script/eval_sd21/eval_ensemble1_step1/41_infer_scannet.sh)
set -e
CKPT=${1:?checkpoint dir}
OUT=${2:-output_eval/eval}
STEPS=${3:-1}
ARCHS=${4:-genpercept}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
python -m genpercept_tpu.cli.infer \
    --checkpoint "$CKPT" \
    --archs "$ARCHS" \
    --denoise_steps "$STEPS" \
    --ensemble_size 1 \
    --seed 1234 \
    --processing_res 0 \
    --dataset_config configs/dataset/eval/scannet.yaml \
    --base_data_dir "$BASE_DATA_DIR" \
    --output_dir "$OUT/scannet_test/prediction" \
    --half_precision
