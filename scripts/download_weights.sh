#!/usr/bin/env bash
# Fetch the published GenPercept checkpoints + the SD2.1 base weights and
# place them where this repo's loaders expect them.
#
# TPU-native analogue of the reference's script/download_weights.sh and
# script/download_sd21.sh (/root/reference/script/): the artifacts are the
# SAME published torch safetensors — io/checkpoints.load_genpercept_checkpoint
# sniffs the published directory layout and io/weights.convert_torch_state_dict
# transforms the torch layout to this repo's NHWC/HWIO pytrees at load time,
# so no offline conversion step is needed.
#
# Two published layouts exist (reference README.md:44-52, run.py:283-293):
#   - per-task FULL diffusers repos (unet/ vae/ text_encoder/ tokenizer/
#     [dpt_head_identity/]): guangkaixu/genpercept-{depth,normal,dis,matting,
#     seg,disparity,disparity-dpt-head} — self-contained, what
#     `--checkpoint <dir>` loads directly. This script fetches these.
#   - the aggregate guangkaixu/genpercept-models repo of UNET-ONLY v2 dirs
#     (unet_<task>_v2/), which need the SD2.1 base for vae/text_encoder —
#     the loader composes those too via --base_ckpt_dir / $BASE_CKPT_DIR
#     pointing at the downloaded stable-diffusion-2-1.
#
# Usage: bash scripts/download_weights.sh [TARGET_DIR=./weights] [TASKS...]
set -euo pipefail

TARGET_DIR="${1:-./weights}"
shift || true
TASKS=("$@")
if [ ${#TASKS[@]} -eq 0 ]; then
  TASKS=(depth normal dis matting seg disparity disparity-dpt-head)
fi

pip install -U "huggingface_hub[cli]" >/dev/null

for task in "${TASKS[@]}"; do
  HF_HUB_OFFLINE=0 HF_HUB_ENABLE_HF_TRANSFER=1 \
    huggingface-cli download "guangkaixu/genpercept-${task}" \
    --repo-type model --local-dir "$TARGET_DIR/genpercept-${task}"
done

# SD2.1 base (vae/text_encoder/tokenizer/scheduler + unet config) — needed
# as --base_ckpt_dir for unet-only checkpoints and by cli.train recipes.
HF_HUB_OFFLINE=0 HF_HUB_ENABLE_HF_TRANSFER=1 \
  huggingface-cli download stabilityai/stable-diffusion-2-1 \
  --repo-type model --local-dir "$TARGET_DIR/stable-diffusion-2-1"

echo "Done. Run e.g.:"
echo "  python -m genpercept_tpu.cli.run --checkpoint $TARGET_DIR/genpercept-depth \\"
echo "      --mode depth --input_rgb_dir <dir> --output_dir out/"
echo "Then validate numerics against the torch reference:"
echo "  python scripts/parity_real.py --checkpoint $TARGET_DIR/genpercept-depth --mode depth"
echo "For unet-only v2 checkpoints (guangkaixu/genpercept-models layout):"
echo "  export BASE_CKPT_DIR=$TARGET_DIR/stable-diffusion-2-1"
echo "  python -m genpercept_tpu.cli.run --checkpoint <.../unet_depth_v2> --mode depth ..."
