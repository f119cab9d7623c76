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
    ap.add_argument("--no_refine", action="store_true",
                    help="plain absmax*margin calibration, no clip search "
                         "or bias correction (A/B baseline)")
    args = ap.parse_args()
    b = args.batch
    excludes = [e for e in args.exclude.split(",") if e]
    refine = not args.no_refine

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer
    from genpercept_tpu.ops.quant import apply_bias_correction, quantize_from_stats

    models = _flagship_models(jnp.bfloat16)
    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16,
                         int8_vae=True, int8_unet=args.unet,
                         int8_unet_dense=args.dense, int8_refine=refine)
    params = models.params()

    calib = jax.jit(build_single_infer(models, cfg, "calibrate"))
    infer_fp = jax.jit(build_single_infer(models, cfg, None))
    infer_q = jax.jit(build_single_infer(models, cfg, "quant"))

    rgb_a = jax.random.uniform(jax.random.key(1), (b, 768, 768, 3), jnp.float32)
    rgb_b = jax.random.uniform(jax.random.key(2), (b, 768, 768, 3), jnp.float32)

    pred_a_fp, stats = calib(params, rgb_a)
    jax.block_until_ready(pred_a_fp)
    def keep(s):
        return {k: v for k, v in s.items()
                if not any(e in k for e in excludes)}

    params = dict(params)
    m = 1.0 if refine else cfg.int8_margin
    params["vae_quant"] = {
        "enc": quantize_from_stats(models.vae, keep(stats["enc"]), m),
        "dec": quantize_from_stats(models.vae, keep(stats["dec"]), m),
    }
    if args.unet:
        params["vae_quant"]["unet"] = quantize_from_stats(
            models.unet, keep(stats["unet"]), m, asymmetric_downsample=False)
    if refine:
        params["vae_quant"] = {
            k: apply_bias_correction(v, stats["corr"][k])
            for k, v in params["vae_quant"].items()}
    print(json.dumps({"op": "quantized_convs",
                      "enc": len(params["vae_quant"]["enc"]),
                      "dec": len(params["vae_quant"]["dec"]),
                      "unet": len(params["vae_quant"].get("unet", {}))},
                     ), flush=True)

    pred_b_fp = np.asarray(infer_fp(params, rgb_b))
    pred_b_q = np.asarray(infer_q(params, rgb_b))
    err = np.abs(pred_b_q - pred_b_fp)
    print(json.dumps({
        "op": "fidelity_int8_vs_bf16_768",
        "max": round(float(err.max()), 5),
        "mean": round(float(err.mean()), 6),
        "p99": round(float(np.percentile(err, 99)), 5),
        "p999": round(float(np.percentile(err, 99.9)), 5),
    }), flush=True)

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
