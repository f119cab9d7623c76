#!/usr/bin/env bash
# One-step depth inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_depth.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept depth weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/depth}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" depth 768
