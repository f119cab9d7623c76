#!/usr/bin/env bash
# Loop checkpoints x eval datasets x (infer -> eval)
# (reference script/eval_sd21/eval_ensemble1_step1/0_infer_eval_all.sh)
set -e
CKPT=${1:?checkpoint dir}
OUT=${2:?output root}
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
for ds in nyu kitti eth3d scannet diode; do
    cfg=configs/dataset/eval/${ds}.yaml
    python -m genpercept_tpu.cli.infer --checkpoint "$CKPT" \
        --dataset_config "$cfg" --base_data_dir "$BASE_DATA_DIR" \
        --output_dir "$OUT/preds/$ds" --half_precision
    align=least_square
    python -m genpercept_tpu.cli.eval --dataset_config "$cfg" \
        --base_data_dir "$BASE_DATA_DIR" --prediction_dir "$OUT/preds/$ds" \
        --output_dir "$OUT/eval/$ds" --alignment $align
done
