"""On-chip throughput of the marigold-arch multi-step path (SD2.1 geometry,
768^2 bf16): DDIM loop over `--steps` denoising steps with the 8-channel
concat UNet input, plus optional on-device ensemble aggregation.

The reference counterpart is Marigold-style inference
(/root/reference/run.py --arch marigold, genpercept_pipeline.py:374-486 with
denoise_steps>1, ensemble_depth): its published timing story is the
one-step GenPercept speedup over this, so the marigold number documents
what the TPU rebuild gets for the slow path.

Usage: timeout 1500 python scripts/profile_marigold.py [--steps 10] [--batch 8]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ensemble", type=int, default=0,
                    help=">0: also time ensemble_depth over this many members")
    args = ap.parse_args()
    b = args.batch

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer

    models = _flagship_models(jnp.bfloat16)
    # marigold checkpoints have the 8-channel conv_in (rgb+pred latent
    # concat); apply the same surgery the trainer does to the random UNet
    from genpercept_tpu.train.train_step import replace_unet_conv_in

    models.unet, models.unet_cfg = replace_unet_conv_in(
        models.unet, models.unet_cfg)
    cfg = PipelineConfig(mode="depth", arch="marigold", dtype=jnp.bfloat16,
                         denoising_steps=args.steps,
                         ensemble_size=max(args.ensemble, 1))
    single = build_single_infer(models, cfg)
    params = models.params()

    rgb = jax.random.uniform(jax.random.key(1), (b, 768, 768, 3), jnp.float32)
    noise = jax.random.normal(jax.random.key(2), (b, 96, 96, 4), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, rgb, noise, n):
        def body(i, carry):
            acc, x = carry
            out = single(params, x, noise)
            s = jnp.sum(out)
            x = x * (1.0 + s * 1e-30)
            return (acc + s, x)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), rgb))[0]

    n_lo, n_hi = 2, 6
    float(run_n(params, rgb, noise, n_lo))
    float(run_n(params, rgb, noise, n_hi))
    t0 = time.perf_counter(); float(run_n(params, rgb, noise, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_n(params, rgb, noise, n_hi))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    print(json.dumps({
        "op": f"marigold_{args.steps}step_768",
        "batch": b,
        "ms_per_batch": round(dt * 1e3, 1),
        "img_per_s": round(b / dt, 2),
    }), flush=True)

    if args.ensemble > 0:
        from genpercept_tpu.pipeline.ensemble import ensemble_predictions

        preds = jax.random.uniform(
            jax.random.key(3), (args.ensemble, 768, 768), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("n",))
        def ens_n(preds, n):
            def body(i, carry):
                acc, p = carry
                merged = ensemble_predictions(p)
                s = jnp.sum(merged)
                p = p * (1.0 + s * 1e-30)
                return (acc + s, p)
            return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), preds))[0]

        float(ens_n(preds, 2)); float(ens_n(preds, 8))
        t0 = time.perf_counter(); float(ens_n(preds, 2))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ens_n(preds, 8))
        t_hi = time.perf_counter() - t0
        dt_e = (t_hi - t_lo) / 6
        print(json.dumps({
            "op": f"ensemble_depth_{args.ensemble}x768",
            "ms": round(dt_e * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
