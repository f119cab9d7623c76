"""Export a trained orbax checkpoint to the published torch-safetensors
layout (unet/ dpt_head[_identity]/ vae_decoder/ subdirs), loadable by both
this framework and the reference/diffusers stack.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import os.path as osp


def build_parser():
    p = argparse.ArgumentParser(description="Export trained checkpoint")
    p.add_argument("--run_dir", required=True, help="training output dir")
    p.add_argument("--base_checkpoint", required=True,
                   help="base SD2.1 checkpoint the run started from")
    p.add_argument("--name", default="latest")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mode", default="depth")
    return p


def main(argv=None):
    import numpy as np

    from genpercept_tpu.io.checkpoints import (
        load_genpercept_checkpoint,
        load_train_checkpoint,
    )
    from genpercept_tpu.io.weights import save_safetensors, to_torch_state_dict
    from genpercept_tpu.train.lora import merge_lora

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    models = load_genpercept_checkpoint(args.base_checkpoint, args.mode)
    state = load_train_checkpoint(osp.join(args.run_dir, "checkpoint"), args.name)
    trainable = state["trainable"]

    os.makedirs(args.output_dir, exist_ok=True)

    unet = models.unet
    if "unet" in trainable:
        unet = trainable["unet"]
    if "unet_lora" in trainable:
        unet = merge_lora(unet, trainable["unet_lora"])
    os.makedirs(osp.join(args.output_dir, "unet"), exist_ok=True)
    save_safetensors(
        to_torch_state_dict(unet),
        osp.join(args.output_dir, "unet/diffusion_pytorch_model.safetensors"),
    )
    src_cfg = osp.join(args.base_checkpoint, "unet/config.json")
    if osp.isfile(src_cfg):
        import shutil

        shutil.copy(src_cfg, osp.join(args.output_dir, "unet/config.json"))

    if "dpt_head" in trainable:
        sub = "dpt_head" if models.dpt_cfg.final_relu else "dpt_head_identity"
        os.makedirs(osp.join(args.output_dir, sub), exist_ok=True)
        save_safetensors(
            to_torch_state_dict(trainable["dpt_head"]),
            osp.join(args.output_dir, sub, "model.safetensors"),
        )
    if "vae" in trainable:  # decoder-finetuned runs
        os.makedirs(osp.join(args.output_dir, "vae_decoder"), exist_ok=True)
        save_safetensors(
            to_torch_state_dict({"decoder": trainable["vae"]["decoder"]}),
            osp.join(args.output_dir, "vae_decoder/model.safetensors"),
        )
        os.makedirs(osp.join(args.output_dir, "vae_post_quant_conv"), exist_ok=True)
        save_safetensors(
            to_torch_state_dict(
                {"post_quant_conv": trainable["vae"]["post_quant_conv"]}
            ),
            osp.join(args.output_dir, "vae_post_quant_conv/model.safetensors"),
        )

    # vae + text embed travel with the base checkpoint; copy the embed so the
    # exported dir is self-contained
    embed = osp.join(args.base_checkpoint, "empty_text_embed.npy")
    if osp.isfile(embed):
        import shutil

        shutil.copy(embed, osp.join(args.output_dir, "empty_text_embed.npy"))
    logging.info(f"exported to {args.output_dir}")


if __name__ == "__main__":
    main()
