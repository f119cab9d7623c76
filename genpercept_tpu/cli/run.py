"""Folder-of-images inference CLI (rebuild of reference `run.py`).

    python -m genpercept_tpu.cli.run \
        --checkpoint /path/to/ckpt --input_rgb_dir imgs/ --output_dir out/ \
        --mode depth

Saves, per image: <name>_pred.npy, <name>_pred.png (16-bit for depth, 8-bit
otherwise), <name>_pred_colored.png for depth/disparity (run.py:434-469).
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
from glob import glob

import numpy as np

EXTENSIONS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GenPercept-TPU folder inference")
    p.add_argument("--checkpoint", required=True, help="checkpoint directory")
    p.add_argument("--base_ckpt_dir", default=None,
                   help="SD2.1 base checkpoint supplying vae/text_encoder/"
                        "tokenizer for unet-only checkpoints (default: "
                        "$BASE_CKPT_DIR, reference accelerate_train.py env "
                        "fallback)")
    p.add_argument("--input_rgb_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mode", default="depth",
                   choices=["depth", "normal", "matting", "dis", "seg",
                            "disparity", "disparity_dpt_head"])
    p.add_argument("--archs", default="genpercept",
                   choices=["genpercept", "rgb_blending", "marigold"])
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--ensemble_size", type=int, default=1)
    p.add_argument("--processing_res", type=int, default=768)
    p.add_argument("--output_processing_res", action="store_true",
                   help="do not resize back to input resolution")
    p.add_argument("--resample_method", default="bilinear",
                   choices=["bilinear", "bicubic", "nearest_exact"])
    p.add_argument("--half_precision", "--bf16", action="store_true",
                   help="bfloat16 compute (TPU-native half precision)")
    p.add_argument("--fix_timesteps", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = single-image loop (reference behavior); >0 or -1"
                        " = batched device inference (-1: auto from oracle)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard device batches over ALL local chips (1-axis "
                        "jax.sharding.Mesh; requires --batch_size)")
    p.add_argument("--int8_vae", action="store_true",
                   help="W8A8 int8 VAE convs (with --int8_unet and the "
                        "default placement: 18.2 vs 16.3 img/s at mean "
                        "per-pixel deviation 9.9e-3 vs bf16, under the "
                        "1e-2 bar — see README)")
    p.add_argument("--int8_unet", action="store_true",
                   help="with --int8_vae: additionally quantize the UNet's "
                        "resnet/down/up convs (transformer matmuls only "
                        "with int8_unet_dense, measured slower)")
    p.add_argument("--int8_no_refine", action="store_true",
                   help="disable the MSE-clip + bias-correction calibration "
                        "refinements (A/B against plain absmax scales)")
    p.add_argument("--int8_exclude", default=None, metavar="SUBSTR[,..]",
                   help="layers whose path contains any of these stay full "
                        "precision (default 'enc_deep': encoder high-res "
                        "down-blocks 0-1 + decoder 128ch tail, ~7e-3 mean "
                        "dev; 'encoder.,decoder.up_blocks.3.' is the "
                        "max-fidelity placement at ~4.8e-3; pass 'none' to "
                        "quantize everything — fails the 1e-2 bar)")
    p.add_argument("--int8_calibration", default=None, metavar="NPZ",
                   help="calibration cache: load the int8 weight tree from "
                        "this file if it exists, else calibrate on the "
                        "first batch and save it there")
    return p


def main(argv=None):
    import jax.numpy as jnp
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from PIL import Image

    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint
    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.archs == "genpercept":
        # genpercept forces one step, no ensemble (reference run.py:209-211)
        args.denoise_steps, args.ensemble_size = 1, 1

    dtype = jnp.bfloat16 if args.half_precision else jnp.float32
    models = load_genpercept_checkpoint(args.checkpoint, args.mode, dtype=dtype,
                                      base_ckpt_dir=args.base_ckpt_dir)
    cfg = PipelineConfig(
        mode=args.mode,
        arch=args.archs,
        processing_res=args.processing_res,
        match_input_res=not args.output_processing_res,
        denoising_steps=args.denoise_steps,
        ensemble_size=args.ensemble_size,
        fix_timesteps=args.fix_timesteps,
        resample_method=args.resample_method,
        dtype=dtype,
        int8_vae=args.int8_vae,
        int8_unet=args.int8_unet,
        int8_refine=not args.int8_no_refine,
        **({} if args.int8_exclude is None else {
            "int8_exclude": () if args.int8_exclude == "none"
            else tuple(s for s in args.int8_exclude.split(",") if s)}),
    )
    mesh = None
    if args.data_parallel:
        import numpy as _np

        import jax

        assert args.batch_size != 0, "--data_parallel needs batched mode"
        mesh = jax.sharding.Mesh(_np.array(jax.devices()), ("data",))
    pipe = GenPerceptPipeline(models, cfg, mesh=mesh)
    if args.int8_calibration and osp.exists(args.int8_calibration):
        pipe.load_calibration(args.int8_calibration)
        logging.info(f"loaded int8 calibration from {args.int8_calibration}")

    rgb_paths = sorted(
        p for p in glob(osp.join(args.input_rgb_dir, "**", "*"), recursive=True)
        if p.lower().endswith(EXTENSIONS)
    )
    assert rgb_paths, f"no images under {args.input_rgb_dir}"
    logging.info(f"inference on {len(rgb_paths)} images, mode={args.mode}")

    os.makedirs(args.output_dir, exist_ok=True)
    import jax

    rng = jax.random.key(args.seed) if args.seed is not None else None

    def save_one(path, out):
        rel_dir = osp.dirname(osp.relpath(path, args.input_rgb_dir))
        out_dir = osp.join(args.output_dir, rel_dir)
        os.makedirs(out_dir, exist_ok=True)
        base = osp.splitext(osp.basename(path))[0] + "_pred"
        np.save(osp.join(out_dir, base + ".npy"), out.pred_np)
        if args.mode == "depth":  # 16-bit png (run.py:451-456)
            png = (out.pred_np * 65535.0).astype(np.uint16)
            Image.fromarray(png).save(osp.join(out_dir, base + ".png"), mode="I;16")
        else:
            png = (out.pred_np * 255.0).astype(np.uint8)
            Image.fromarray(png).save(osp.join(out_dir, base + ".png"))
        if out.pred_colored is not None:
            Image.fromarray(out.pred_colored).save(
                osp.join(out_dir, base + "_colored.png")
            )
        if out.uncertainty is not None:
            # ensemble disagreement map (reference returns `uncertainty` from
            # ensemble_depth, util/ensemble.py:124-140)
            np.save(osp.join(out_dir, base + "_uncert.npy"), out.uncertainty)
        logging.info(f"saved {base} -> {out_dir}")

    if args.batch_size != 0 and args.archs == "genpercept":
        images = [np.asarray(Image.open(p).convert("RGB")) for p in rgb_paths]
        outs = pipe.batch(images, batch_size=max(args.batch_size, 0))
        for path, out in zip(rgb_paths, outs):
            save_one(path, out)
    else:
        for path in rgb_paths:
            image = np.asarray(Image.open(path).convert("RGB"))
            save_one(path, pipe(image, rng=rng))

    if (args.int8_calibration and pipe._calibrated and args.int8_vae
            and not osp.exists(args.int8_calibration)):
        pipe.save_calibration(args.int8_calibration)
        logging.info(f"saved int8 calibration to {args.int8_calibration}")


if __name__ == "__main__":
    main()
