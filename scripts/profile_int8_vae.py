"""On-chip validation of the W8A8 int8 VAE path at SD scale (768^2 b16).

Measures, on the real TPU with the flagship (SD2.1-geometry) models:
  1. fidelity: per-pixel deviation of the int8 pipeline vs full bf16, with
     calibration on a DIFFERENT batch than the one evaluated (tests that
     static activation scales transfer across inputs);
  2. throughput: loop-carried marginal img/s of the quantized pipeline.

Usage: timeout 1200 python scripts/profile_int8_vae.py [--batch 16]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--exclude", default="",
                    help="comma-separated path substrings to keep in bf16")
    ap.add_argument("--unet", action="store_true",
                    help="also quantize the UNet convs (int8_unet mode)")
    ap.add_argument("--dense", action="store_true",
                    help="with --unet: quantize the transformer matmuls too "
                         "(int8_unet_dense; measured slower end-to-end)")
    ap.add_argument("--ff", action="store_true",
                    help="with --unet: quantize ONLY the GEGLU feed-forward "
                         "matmuls and run each FF as one fused s8 Pallas "
                         "program (int8_unet_ff)")
    ap.add_argument("--vae_attn", action="store_true",
                    help="s8 QK^T/PV flash kernel + int8 projections for "
                         "the VAE mid-block d=512 attention")
    ap.add_argument("--symmetric", action="store_true",
                    help="disable asymmetric (zero-point) activation "
                         "quantization (A/B baseline; asymmetric is the "
                         "default — post-SiLU inputs are skewed positive)")
    ap.add_argument("--no_refine", action="store_true",
                    help="plain absmax*margin calibration, no clip search "
                         "or bias correction (A/B baseline)")
    ap.add_argument("--heavy_tails", action="store_true",
                    help="re-draw weights with heavy-tailed statistics "
                         "(Student-t entries, log-normal channel scales, "
                         "GroupNorm outlier gains) — the offline surrogate "
                         "for trained SD2.1 weights; see utils/synthetic.py")
    ap.add_argument("--weight_clip", action="store_true",
                    help="per-output-channel MSE clip search on the "
                         "activation-folded weights (outlier-aware PTQ)")
    ap.add_argument("--gptq", action="store_true",
                    help="GPTQ error-compensated weight rounding for the "
                         "VAE convs (collects code-domain input Grams "
                         "during calibration; calibrates at chunk 2)")
    ap.add_argument("--natural", action="store_true",
                    help="natural-image-like calibration/eval inputs "
                         "(gradients+edges) instead of uniform noise")
    ap.add_argument("--attribution", action="store_true",
                    help="also measure weight-only and activation-only "
                         "fake-quant deviations (two extra compiles)")
    ap.add_argument("--skip_throughput", action="store_true",
                    help="fidelity only (skips the timing loop)")
    args = ap.parse_args()
    b = args.batch
    excludes = [e for e in args.exclude.split(",") if e]
    refine = not args.no_refine

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.ops.quant import (
        apply_bias_correction, calibrate_chunked, quantize_from_stats)

    models = _flagship_models(jnp.bfloat16)
    if args.heavy_tails:
        from genpercept_tpu.utils.synthetic import heavy_tail_params

        models.unet = heavy_tail_params(models.unet, jax.random.key(7))
        models.vae = heavy_tail_params(models.vae, jax.random.key(8))
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16,
                         int8_vae=True, int8_unet=args.unet,
                         int8_unet_dense=args.dense, int8_refine=refine,
                         int8_unet_ff=args.ff,
                         int8_weight_clip=args.weight_clip,
                         int8_asymmetric=not args.symmetric,
                         int8_gptq=args.gptq,
                         int8_vae_attn=args.vae_attn)
    params = models.params()

    calib = jax.jit(build_single_infer(models, cfg, "calibrate"))
    infer_fp = jax.jit(build_single_infer(models, cfg, None))
    infer_q = jax.jit(build_single_infer(models, cfg, "quant"))

    if args.natural:
        from genpercept_tpu.utils.synthetic import natural_like_images

        rgb_a = natural_like_images(jax.random.key(1), b, 768)
        rgb_b = natural_like_images(jax.random.key(2), b, 768)
    else:
        rgb_a = jax.random.uniform(jax.random.key(1), (b, 768, 768, 3),
                                   jnp.float32)
        rgb_b = jax.random.uniform(jax.random.key(2), (b, 768, 768, 3),
                                   jnp.float32)

    # chunked: the batch-16 asym calibration program needs 25.4 GB HBM
    # (chunk 1 with the GPTQ Grams resident — ~1.8 GB of per-chunk Gram
    # outputs must coexist with the calibration live set; chunk 2 for
    # asym — the endpoint-shrink clip search OOMs at chunk 4)
    chunk = 1 if args.gptq else (4 if args.symmetric else 2)
    pred_a_fp, stats = calibrate_chunked(calib, params, rgb_a, chunk=chunk)
    jax.block_until_ready(pred_a_fp)
    # Pull the GPTQ Grams to host and run the batch-16 FULL-PRECISION
    # reference now, before any quantization state exists: the fp program
    # needs nearly the whole 16 GB HBM, and with the Grams + quantized
    # trees resident it reproducibly OOMs (twice, at this exact call).
    # The fp reference depends only on params + rgb_b anyway.
    hess = jax.tree.map(np.asarray, stats.pop("hess", {}))
    pred_b_fp = np.asarray(infer_fp(params, rgb_b))

    def keep(s):
        return {k: v for k, v in s.items()
                if not any(e in k for e in excludes)}

    params = dict(params)
    m = 1.0 if refine else cfg.int8_margin
    wc = args.weight_clip
    params["vae_quant"] = {
        "enc": quantize_from_stats(models.vae, keep(stats["enc"]), m,
                                   weight_clip=wc, hess=hess.get("enc")),
        "dec": quantize_from_stats(models.vae, keep(stats["dec"]), m,
                                   weight_clip=wc, hess=hess.get("dec")),
    }
    if args.unet:
        params["vae_quant"]["unet"] = quantize_from_stats(
            models.unet, keep(stats["unet"]), m, asymmetric_downsample=False,
            weight_clip=wc)
    del hess
    if refine:
        params["vae_quant"] = {
            k: apply_bias_correction(v, stats["corr"][k])
            for k, v in params["vae_quant"].items()}
    print(json.dumps({"op": "quantized_convs",
                      "enc": len(params["vae_quant"]["enc"]),
                      "dec": len(params["vae_quant"]["dec"]),
                      "unet": len(params["vae_quant"].get("unet", {}))},
                     ), flush=True)

    pred_b_q = np.asarray(infer_q(params, rgb_b))
    err = np.abs(pred_b_q - pred_b_fp)
    print(json.dumps({
        "op": "fidelity_int8_vs_bf16_768",
        "max": round(float(err.max()), 5),
        "mean": round(float(err.mean()), 6),
        "p99": round(float(np.percentile(err, 99)), 5),
        "p999": round(float(np.percentile(err, 99.9)), 5),
    }), flush=True)

    if args.attribution:
        for side in ("w", "a"):
            infer_f = jax.jit(build_single_infer(models, cfg, f"fake:{side}"))
            pred_f = np.asarray(infer_f(params, rgb_b))
            e = np.abs(pred_f - pred_b_fp)
            print(json.dumps({
                "op": f"fidelity_fakequant_{side}_only",
                "mean": round(float(e.mean()), 6),
                "p99": round(float(np.percentile(e, 99)), 5),
            }), flush=True)

    if args.skip_throughput:
        return

    single = build_single_infer(models, cfg, "quant")

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, rgb, n):
        def body(i, carry):
            acc, x = carry
            out = single(params, x)
            s = jnp.sum(out)
            x = x * (1.0 + s * 1e-30)
            return (acc + s, x)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), rgb))[0]

    n_lo, n_hi = 2, 8
    float(run_n(params, rgb_b, n_lo))
    float(run_n(params, rgb_b, n_hi))
    t0 = time.perf_counter()
    float(run_n(params, rgb_b, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(params, rgb_b, n_hi))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    print(json.dumps({
        "op": "int8_vae_pipeline_768",
        "ms_per_batch": round(dt * 1000, 1),
        "img_per_s": round(b / dt, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
