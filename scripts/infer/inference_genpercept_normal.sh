#!/usr/bin/env bash
# One-step normal inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_normal.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept normal weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/normal}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" normal 768
