#!/usr/bin/env bash
# Fetch the published GenPercept checkpoints + the SD2.1 base weights and
# place them where this repo's loaders expect them.
#
# TPU-native analogue of the reference's script/download_weights.sh and
# script/download_sd21.sh (/root/reference/script/): the artifacts are the
# SAME published torch safetensors — io/checkpoints.load_genpercept_checkpoint
# sniffs the published directory layout (unet/ vae/ dpt_head[_identity]/
# vae_decoder/ ...) and io/weights.convert_torch_state_dict transforms the
# torch layout to this repo's NHWC/HWIO pytrees at load time, so no offline
# conversion step is needed.
#
# Usage: bash scripts/download_weights.sh [TARGET_DIR=./weights]
set -euo pipefail

TARGET_DIR="${1:-./weights}"

pip install -U "huggingface_hub[cli]" >/dev/null

# All 7 task checkpoints (depth, normal, dis, matting, seg, disparity,
# disparity_dpt_head) from the GenPercept release.
HF_HUB_OFFLINE=0 HF_HUB_ENABLE_HF_TRANSFER=1 \
  huggingface-cli download guangkaixu/genpercept-models \
  --repo-type model --local-dir "$TARGET_DIR"

# SD2.1 base (tokenizer/text_encoder/scheduler configs + empty-text embed
# fallback path for v1 checkpoints).
HF_HUB_OFFLINE=0 HF_HUB_ENABLE_HF_TRANSFER=1 \
  huggingface-cli download stabilityai/stable-diffusion-2-1 \
  --repo-type model --local-dir "$TARGET_DIR/stable-diffusion-2-1"

echo "Done. Run e.g.:"
echo "  python -m genpercept_tpu.cli.run --checkpoint $TARGET_DIR/weights/genpercept_ckpt_depth --mode depth --input_rgb_dir <dir> --output_dir out/"
