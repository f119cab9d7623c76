#!/usr/bin/env bash
# Disparity inference with the DPT-head-identity decoder (reference
# script/infer/main_paper/inference_genpercept_disparity_dpt_head.sh).
# The checkpoint layout (dpt_head_identity/ subdir) selects the head path.
set -e
CKPT=${1:?checkpoint dir (dpt_head_identity layout)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/disparity_dpt_head}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" disparity_dpt_head 768
