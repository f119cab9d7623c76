#!/usr/bin/env bash
# One-step seg inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_seg.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept seg weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/seg}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" seg 768
