"""Micro-profile of VAE resblock constituents on the real TPU: per decoder
level (768^2@128, 384^2@256, 192^2@512), time the bare 3x3 conv, the
GroupNorm+SiLU pair, and the full resnet_block, with the loop-carried
marginal-cost methodology (see bench.py NOTE). Prints one JSON line per
measurement with achieved TFLOP/s for the convs.

Usage: timeout 590 python scripts/profile_resblock.py [--batch 16] [--level all]
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
    """Unlike bench.py, the loop-carried data dependency goes through the
    (small) PARAMS rather than the activation: multiplying the full
    activation adds a read+write of the whole tensor per iteration (~9 ms at
    768^2@128 b16), which would swamp small ops like a bare GroupNorm."""

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
    ap.add_argument("--level", default="all", help="768 | 384 | 192 | all")
    args = ap.parse_args()

    from genpercept_tpu.models.layers import init_resnet_block, resnet_block
    from genpercept_tpu.ops import conv2d, group_norm

    b = args.batch
    levels = [(768, 128), (384, 256), (192, 512)]
    if args.level != "all":
        levels = [lv for lv in levels if lv[0] == int(args.level)]

    for hw, c in levels:
        key = jax.random.key(hw)
        x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
        p = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16),
            init_resnet_block(key, c, c, None),
        )

        def bare_conv(p, x):
            return conv2d(x, p["conv1"]["weight"], p["conv1"]["bias"])

        def gn_silu(p, x):
            h = group_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], 32, 1e-6)
            return jax.nn.silu(h)

        def block(p, x):
            return resnet_block(p, x, None, eps=1e-6)

        conv_flops = 2 * 9 * b * hw * hw * c * c
        for name, fn, flops in (
            ("conv3x3", bare_conv, conv_flops),
            ("gn_silu", gn_silu, 0),
            ("resblock", block, 2 * conv_flops),
        ):
            dt = marginal_time(fn, p, x)
            rec = {
                "level": f"{hw}x{hw}@{c}",
                "op": name,
                "ms": round(dt * 1000, 2),
            }
            if flops:
                rec["tflops"] = round(flops / dt / 1e12, 1)
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
