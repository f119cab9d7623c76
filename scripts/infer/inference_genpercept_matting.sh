#!/usr/bin/env bash
# One-step matting inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_matting.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept matting weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/matting}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" matting 768
