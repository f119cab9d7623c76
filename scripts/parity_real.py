"""Real-weight parity harness (VERDICT r2 #2): ready to run the minute the
published checkpoints exist on disk.

Every in-tree fidelity number was historically measured on random-init
weights; the BASELINE bar is per-pixel <=1e-2 vs the PYTORCH reference on
the published checkpoints (reference run.py:283-357 load path,
scripts/download_weights.sh fetch). This script is the one-command check:

  1. loads a published checkpoint (full diffusers layout or unet-only v2 +
     --base_ckpt_dir) via io/checkpoints.load_genpercept_checkpoint;
  2. runs the fp32 pipeline, the bf16 pipeline, and the int8
     default-placement pipeline on a FIXED deterministic image set (or
     --images <dir>), saving inputs + predictions under --out;
  3. measures fp32-vs-bf16 drift and int8-vs-fp32 deviation on REAL
     weights (the two untested gaps VERDICT r2 called out);
  4. if --reference <npz> is given (torch-reference predictions on the
     SAME saved inputs), compares against it and enforces the <=1e-2 bar;
  5. --export_roundtrip: exports the loaded params back to the torch
     layout (cli.export path) and re-loads them, asserting bit-equality.

Producing the torch golden on a CUDA/CPU box with the reference repo:
    # after this script saved inputs under OUT/inputs/*.png
    python run.py --checkpoint <ckpt> --mode <mode> \
        --input_rgb_dir OUT/inputs --output_dir OUT/torch ...
    python -c "import numpy as np, glob; np.savez('ref.npz', **{ \
        p.split('/')[-1].replace('_pred.npy',''): np.load(p) \
        for p in glob.glob('OUT/torch/**/*_pred.npy', recursive=True)})"

Exit code is nonzero if any enforced bar fails.

Usage:
  python scripts/parity_real.py --checkpoint weights/genpercept-depth \
      [--mode depth] [--base_ckpt_dir weights/stable-diffusion-2-1]
      [--images <dir>] [--out /tmp/parity] [--reference ref.npz]
      [--export_roundtrip] [--batch 4] [--res 768] [--skip_int8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BAR = 1e-2  # per-pixel mean |dev| bar (BASELINE.json / BASELINE.md)


def _load_images(args):
    import jax

    from genpercept_tpu.utils.synthetic import natural_like_images

    if args.images:
        from PIL import Image

        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        assert paths, f"no images under {args.images}"
        imgs, names = [], []
        for p in paths[: args.batch]:
            im = Image.open(p).convert("RGB").resize((args.res, args.res))
            imgs.append(np.asarray(im, np.float32) / 255.0)
            names.append(os.path.splitext(os.path.basename(p))[0])
        return np.stack(imgs), names
    # fixed deterministic set (same every run/machine: the torch golden can
    # be generated from the PNGs this script saves)
    imgs = np.asarray(
        natural_like_images(jax.random.key(0), args.batch, args.res))
    return imgs, [f"synthetic_{i:02d}" for i in range(args.batch)]


def _run(models, mode, dtype, imgs, int8=False, int8_exclude=None):
    import jax
    import jax.numpy as jnp

    from genpercept_tpu.pipeline import GenPerceptPipeline, PipelineConfig

    extra = {} if int8_exclude is None else {"int8_exclude": int8_exclude}
    cfg = PipelineConfig(mode=mode, dtype=dtype, processing_res=0,
                         match_input_res=False,
                         int8_vae=int8, int8_unet=int8, **extra)
    pipe = GenPerceptPipeline(models, cfg)
    x = jnp.asarray(imgs)
    if int8:
        _ = pipe._run(x)  # calibration batch (same images)
    pred = pipe._run(x)
    return np.asarray(jax.device_get(pred), np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="depth")
    ap.add_argument("--base_ckpt_dir", default=None)
    ap.add_argument("--images", default=None)
    ap.add_argument("--out", default="/tmp/genpercept_parity")
    ap.add_argument("--reference", default=None,
                    help="npz of torch-reference predictions keyed by image "
                         "name (see module docstring)")
    ap.add_argument("--export_roundtrip", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--skip_int8", action="store_true")
    ap.add_argument("--int8_exclude", default=None, metavar="SUBSTR[,..]",
                    help="int8 placement override (as cli.run); default is "
                         "the production PipelineConfig placement")
    ap.add_argument("--skip_fp32", action="store_true",
                    help="bf16 + int8 only (fp32 at 768^2 can OOM 16 GB)")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize registers the axon TPU plugin at interpreter start;
        # the env var alone does not stick (see CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from genpercept_tpu.io.checkpoints import load_genpercept_checkpoint

    os.makedirs(os.path.join(args.out, "inputs"), exist_ok=True)
    imgs, names = _load_images(args)
    from PIL import Image

    for im, name in zip(imgs, names):
        Image.fromarray((im * 255).astype(np.uint8)).save(
            os.path.join(args.out, "inputs", name + ".png"))

    failures = []
    results = {}

    models = load_genpercept_checkpoint(
        args.checkpoint, args.mode, dtype=jnp.float32,
        base_ckpt_dir=args.base_ckpt_dir)

    preds = {}
    if not args.skip_fp32:
        preds["fp32"] = _run(models, args.mode, jnp.float32, imgs)
    models_bf16 = load_genpercept_checkpoint(
        args.checkpoint, args.mode, dtype=jnp.bfloat16,
        base_ckpt_dir=args.base_ckpt_dir)
    preds["bf16"] = _run(models_bf16, args.mode, jnp.bfloat16, imgs)
    if not args.skip_int8:
        excl = (None if args.int8_exclude is None else
                () if args.int8_exclude == "none" else
                tuple(s for s in args.int8_exclude.split(",") if s))
        preds["int8"] = _run(models_bf16, args.mode, jnp.bfloat16, imgs,
                             int8=True, int8_exclude=excl)

    for k, p in preds.items():
        np.savez(os.path.join(args.out, f"pred_{k}.npz"),
                 **dict(zip(names, p)))

    # informational: bf16 drift vs fp32 (half of the stacked-gap question)
    if "fp32" in preds:
        err = np.abs(preds["bf16"] - preds["fp32"])
        rec = {"op": "realweight_bf16_vs_fp32",
               "mean": round(float(err.mean()), 6),
               "p99": round(float(np.percentile(err, 99)), 5)}
        results["bf16"] = rec
        print(json.dumps(rec), flush=True)

    # ENFORCED: the int8 placement bar, measured against the SAME-dtype
    # bf16 baseline (the other half; same methodology as
    # profile_int8_vae.py so the number is comparable)
    if "int8" in preds:
        err = np.abs(preds["int8"] - preds["bf16"])
        rec = {"op": "realweight_int8_vs_bf16",
               "mean": round(float(err.mean()), 6),
               "p99": round(float(np.percentile(err, 99)), 5),
               "max": round(float(err.max()), 5)}
        results["int8"] = rec
        print(json.dumps(rec), flush=True)
        if err.mean() > BAR:
            failures.append(f"int8 vs bf16: mean {err.mean():.4g} > {BAR}")

    if args.reference:
        with np.load(args.reference) as z:
            for k, p in preds.items():
                errs = [np.abs(p[i] - z[n]) for i, n in enumerate(names)
                        if n in z]
                assert errs, f"no matching names in {args.reference}"
                err = np.concatenate([e.ravel() for e in errs])
                rec = {"op": f"realweight_{k}_vs_torch_reference",
                       "mean": round(float(err.mean()), 6),
                       "p99": round(float(np.percentile(err, 99)), 5)}
                print(json.dumps(rec), flush=True)
                if err.mean() > BAR:
                    failures.append(
                        f"{k} vs torch: mean {err.mean():.4g} > {BAR}")

    if args.export_roundtrip:
        from genpercept_tpu.io.weights import (
            load_safetensors, save_safetensors, to_torch_state_dict)

        rt_dir = os.path.join(args.out, "export_roundtrip")
        os.makedirs(rt_dir, exist_ok=True)
        sd = to_torch_state_dict(models.unet)
        path = os.path.join(rt_dir, "unet.safetensors")
        save_safetensors(sd, path)
        from genpercept_tpu.io.weights import convert_torch_state_dict

        unet2 = convert_torch_state_dict(load_safetensors(path),
                                         dtype=jnp.float32)
        import jax

        mismatch = [
            kp for (kp, a), b in zip(
                jax.tree_util.tree_flatten_with_path(models.unet)[0],
                jax.tree_util.tree_leaves(unet2))
            if not np.array_equal(np.asarray(a), np.asarray(b))]
        rec = {"op": "export_roundtrip_unet",
               "bit_exact": not mismatch, "n_mismatch": len(mismatch)}
        print(json.dumps(rec), flush=True)
        if mismatch:
            failures.append(f"export roundtrip: {len(mismatch)} leaves differ")

    if failures:
        print(json.dumps({"op": "parity_real", "status": "FAIL",
                          "failures": failures}), flush=True)
        sys.exit(1)
    print(json.dumps({"op": "parity_real", "status": "ok"}), flush=True)


if __name__ == "__main__":
    main()
