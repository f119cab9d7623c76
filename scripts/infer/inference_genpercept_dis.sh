#!/usr/bin/env bash
# One-step dis inference on a folder of images (reference
# script/infer/main_paper/inference_genpercept_dis.sh)
set -e
CKPT=${1:?checkpoint dir (genpercept dis weights)}
INPUT=${2:?input rgb dir}
OUTPUT=${3:-output/dis}
bash "$(dirname "$0")/inference_general.sh" "$CKPT" "$INPUT" "$OUTPUT" dis 768
