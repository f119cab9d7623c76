#!/usr/bin/env bash
# One-step disparity inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_disparity.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept disparity weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/disparity}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" disparity 768
