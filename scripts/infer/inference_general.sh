#!/usr/bin/env bash
# Parameterized folder inference (reference script/infer/inference_general.sh)
set -e
CKPT=${1:?checkpoint dir}
INPUT=${2:?input rgb dir}
OUTPUT=${3:?output dir}
MODE=${4:-depth}
RES=${5:-768}
python -m genpercept_tpu.cli.run \
    --checkpoint "$CKPT" --input_rgb_dir "$INPUT" --output_dir "$OUTPUT" \
    --mode "$MODE" --processing_res "$RES" --half_precision
