"""VAE encoder stage-by-stage profile on the real TPU: cumulative prefixes
(conv_in / down0..3 / mid / full) timed with the loop-carried marginal-cost
method, to localize the encoder's gap vs the isolated-conv floor
(suspects: the ci=3 conv_in at 768^2 — a 3-deep MXU contraction — and the
asymmetric-pad stride-2 downsamplers).

Usage: timeout 3000 python scripts/profile_encoder.py [--batch 16]
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
    ap.add_argument("--stages", default=None,
                    help="comma list among conv_in,down0..down3,mid,full")
    args = ap.parse_args()
    b = args.batch

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.models.layers import (
        conv,
        downsample2d,
        resnet_block,
        vae_attention,
    )
    from genpercept_tpu.ops import group_norm
    from genpercept_tpu.ops.conv import conv1x1

    models = _flagship_models(jnp.bfloat16)
    vae = models.params()["vae"]
    x = jax.random.uniform(jax.random.key(0), (b, 768, 768, 3), jnp.bfloat16)

    def upto(stage):
        def fn(p, x):
            enc = p["encoder"]
            h = conv(enc["conv_in"], x)
            if stage == "conv_in":
                return h
            for i in range(4):
                blk = enc["down_blocks"][str(i)]
                for j in range(2):
                    h = resnet_block(blk["resnets"][str(j)], h, None, eps=1e-6)
                if "downsamplers" in blk:
                    h = downsample2d(blk["downsamplers"]["0"], h,
                                     asymmetric_pad=True)
                if stage == f"down{i}":
                    return h
            mid = enc["mid_block"]
            h = resnet_block(mid["resnets"]["0"], h, None, eps=1e-6)
            h = vae_attention(mid["attentions"]["0"], h)
            h = resnet_block(mid["resnets"]["1"], h, None, eps=1e-6)
            if stage == "mid":
                return h
            h = group_norm(h, enc["conv_norm_out"]["weight"],
                           enc["conv_norm_out"]["bias"], 32, 1e-6)
            h = jax.nn.silu(h)
            h = conv(enc["conv_out"], h)
            return conv1x1(h, p["quant_conv"]["weight"][0, 0],
                           p["quant_conv"].get("bias"))

        return fn

    stages = (args.stages.split(",") if args.stages
              else ["conv_in", "down0", "down1", "down2", "down3", "mid", "full"])
    prev = 0.0
    for stage in stages:
        dt = marginal_time(upto(stage), vae, x)
        print(json.dumps({
            "stage": stage,
            "cum_ms": round(dt * 1000, 2),
            "delta_ms": round((dt - prev) * 1000, 2),
        }))
        prev = dt


if __name__ == "__main__":
    main()
