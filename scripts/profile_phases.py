"""Per-phase throughput profile on the real TPU: VAE encode / UNet / VAE
decode / full pipeline, each timed with the loop-carried marginal-cost
methodology from bench.py (the axon tunnel does not sync on
block_until_ready and XLA hoists loop-invariant bodies).

Usage: timeout 590 python scripts/profile_phases.py [--batch 16] [--res 768]
Prints one JSON line per phase.
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


def marginal_time(fn, params, x, n_lo=2, n_hi=8):
    """Marginal seconds per iteration of fn(params, x) -> array."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, carry):
            acc, z = carry
            out = fn(params, z)
            s = jnp.sum(out).astype(jnp.float32)
            z = z * (1.0 + s.astype(z.dtype) * 1e-30)
            return (acc + s, z)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), x))[0]

    float(run_n(params, x, n_lo))
    float(run_n(params, x, n_hi))
    t0 = time.perf_counter()
    float(run_n(params, x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(params, x, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--phase", default=None,
                    help="one of vae_encode/unet/vae_decode/full_pipeline")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.models import unet_apply, vae_decode, vae_encode
    from genpercept_tpu.pipeline import PipelineConfig, build_single_infer

    b, res = args.batch, args.res
    lat = res // 8
    models = _flagship_models(jnp.bfloat16)
    params = models.params()
    unet_cfg, vae_cfg = models.unet_cfg, models.vae_cfg
    text = jnp.zeros((b, 77, 1024), jnp.bfloat16)

    rgb = jax.random.uniform(jax.random.key(0), (b, res, res, 3), jnp.bfloat16)
    latent = jax.random.normal(jax.random.key(1), (b, lat, lat, 4), jnp.bfloat16)

    phases = {}

    def enc(p, x):
        return vae_encode(p["vae"], x, vae_cfg)

    def unet(p, z):
        return unet_apply(p["unet"], z, jnp.int32(1), text, unet_cfg)

    def dec(p, z):
        return vae_decode(p["vae"], z, vae_cfg)

    cfg = PipelineConfig(mode="depth", dtype=jnp.bfloat16)
    infer = build_single_infer(models, cfg)

    def full(p, x):
        return infer(p, x)

    all_phases = [
        ("vae_encode", enc, rgb),
        ("unet", unet, latent),
        ("vae_decode", dec, latent),
        ("full_pipeline", full, rgb.astype(jnp.float32)),
    ]
    if args.phase:
        all_phases = [p for p in all_phases if p[0] == args.phase]
    for name, fn, x in all_phases:
        dt = marginal_time(fn, params, x)
        phases[name] = dt
        print(json.dumps({
            "phase": name,
            "ms_per_batch": round(dt * 1000, 2),
            "ms_per_img": round(dt / b * 1000, 3),
            "img_per_s": round(b / dt, 2),
        }))

    if len(phases) == 4:
        total_parts = phases["vae_encode"] + phases["unet"] + phases["vae_decode"]
        print(json.dumps({
            "phase": "sum_of_parts",
            "ms_per_batch": round(total_parts * 1000, 2),
            "full_minus_parts_ms": round(
                (phases["full_pipeline"] - total_parts) * 1000, 2
            ),
            "shares": {
                k: round(phases[k] / total_parts, 3)
                for k in ("vae_encode", "unet", "vae_decode")
            },
        }))


if __name__ == "__main__":
    main()
