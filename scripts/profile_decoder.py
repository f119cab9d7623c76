"""VAE decoder stage-by-stage profile on the real TPU: times cumulative
prefixes of vae_decode (mid / +up0..3 / full) so the gap between
sum-of-parts micro numbers and the measured whole-decoder time can be
localized.

Usage: timeout 590 python scripts/profile_decoder.py [--batch 16]
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


def marginal_time(fn, params, x, n_lo=2, n_hi=6):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, carry):
            acc, p = carry
            out = fn(p, x)
            s = jnp.sum(out).astype(jnp.float32)
            p = jax.tree.map(lambda t: t * (1.0 + s.astype(t.dtype) * 1e-30), p)
            return (acc + s, p)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), params))[0]

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
    args = ap.parse_args()
    b = args.batch

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.models.layers import resnet_block, upsample2d, vae_attention
    from genpercept_tpu.ops import group_norm
    from genpercept_tpu.ops.conv import conv1x1
    from genpercept_tpu.models.layers import conv

    models = _flagship_models(jnp.bfloat16)
    vae = models.params()["vae"]
    z = jax.random.normal(jax.random.key(0), (b, 96, 96, 4), jnp.bfloat16)

    def upto(stage):
        def fn(p, z):
            dec = p["decoder"]
            h = z / 0.18215
            h = conv1x1(h, p["post_quant_conv"]["weight"][0, 0],
                        p["post_quant_conv"].get("bias"))
            h = conv(dec["conv_in"], h)
            mid = dec["mid_block"]
            h = resnet_block(mid["resnets"]["0"], h, None, eps=1e-6)
            h = vae_attention(mid["attentions"]["0"], h)
            h = resnet_block(mid["resnets"]["1"], h, None, eps=1e-6)
            if stage == "mid":
                return h
            for i in range(4):
                blk = dec["up_blocks"][str(i)]
                for j in range(3):
                    h = resnet_block(blk["resnets"][str(j)], h, None, eps=1e-6)
                if "upsamplers" in blk:
                    h = upsample2d(blk["upsamplers"]["0"], h)
                if stage == f"up{i}":
                    return h
            h = group_norm(h, dec["conv_norm_out"]["weight"],
                           dec["conv_norm_out"]["bias"], 32, 1e-6)
            h = jax.nn.silu(h)
            return conv(dec["conv_out"], h)

        return fn

    prev = 0.0
    for stage in ("mid", "up0", "up1", "up2", "up3", "full"):
        dt = marginal_time(upto(stage), vae, z)
        print(json.dumps({
            "stage": stage,
            "cum_ms": round(dt * 1000, 2),
            "delta_ms": round((dt - prev) * 1000, 2),
        }))
        prev = dt


if __name__ == "__main__":
    main()
