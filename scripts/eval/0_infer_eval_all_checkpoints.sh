#!/usr/bin/env bash
# Loop a LIST of checkpoints x 5 eval datasets x (infer -> eval) — the
# reference's batch-evaluation driver (script/eval_sd21/eval_ensemble1_step1/
# 0_infer_eval_all.sh). Edit ckpt_list or pass dirs as arguments.
# Disparity checkpoints: pass ALIGN=least_square_disparity in the env.
set -e
: "${BASE_DATA_DIR:?set BASE_DATA_DIR}"
OUT_ROOT=${OUT_ROOT:-output_eval_tpu}
ALIGN=${ALIGN:-least_square}
STEPS=${STEPS:-1}

ckpt_list=("$@")
[ ${#ckpt_list[@]} -gt 0 ] || { echo "usage: $0 ckpt_dir [ckpt_dir ...]"; exit 1; }

here=$(dirname "$0")
for ckpt in "${ckpt_list[@]}"; do
    sub=$(basename "$ckpt")
    i=1
    for ds in nyu kitti eth3d scannet diode; do
        bash "$here/${i}1_infer_${ds}.sh" "$ckpt" "$OUT_ROOT/$sub" "$STEPS"
        bash "$here/${i}2_eval_${ds}.sh" "$OUT_ROOT/$sub" "$ALIGN"
        i=$((i+1))
    done
done
