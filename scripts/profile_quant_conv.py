"""On-chip A/B of the Pallas W8A8 conv3x3 (ops/quant_conv.py) vs the XLA
s8-conv path (qconv_apply) at the VAE/UNet hot shapes.

Marginal-cost timing inside one jit (see bench.py methodology).

Usage: timeout 900 python scripts/profile_quant_conv.py [--batch 16]
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

SHAPES = [  # (H, W, C, Co) at batch b; the bandwidth-bound decoder/encoder levels
    (768, 768, 128, 128),
    (384, 384, 256, 256),
    (192, 192, 512, 512),
    (96, 96, 512, 512),
    (96, 96, 320, 320),   # UNet level-0 resnet
]


def timeit(fn, params, x, n_lo=4, n_hi=12):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(params, x, n):
        def body(i, carry):
            acc, xx = carry
            out = fn(params, xx)
            s = jnp.sum(out).astype(jnp.float32)
            xx = xx * (1.0 + s * 1e-30).astype(xx.dtype)
            return (acc + s, xx)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), x))[0]

    float(run_n(params, x, n_lo))
    float(run_n(params, x, n_hi))
    t0 = time.perf_counter(); float(run_n(params, x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_n(params, x, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch

    from genpercept_tpu.ops.quant import absmax_per_channel, quantize_conv
    from genpercept_tpu.ops.quant import qconv_apply
    from genpercept_tpu.ops.quant_conv import quantized_conv3x3

    for h, w, c, co in SHAPES:
        key = jax.random.key(h + c)
        kx, kp = jax.random.split(key)
        x = (jax.random.normal(kx, (b, h, w, c), jnp.float32)
             .astype(jnp.bfloat16))
        p = {"weight": jax.random.normal(kp, (3, 3, c, co), jnp.float32) * 0.05,
             "bias": jnp.zeros((co,), jnp.float32)}
        q = quantize_conv(p, absmax_per_channel(x), margin=1.0)

        dt_xla = timeit(lambda qq, xx: qconv_apply(qq, xx), q, x)
        dt_pl = timeit(
            lambda qq, xx: quantized_conv3x3(xx, qq.w_int8, qq.inv_a,
                                             qq.o_scale, qq.bias), q, x)
        flop = 2.0 * b * h * w * c * co * 9
        print(json.dumps({
            "shape": [b, h, w, c, co],
            "xla_ms": round(dt_xla * 1e3, 2),
            "pallas_ms": round(dt_pl * 1e3, 2),
            "xla_tflops": round(flop / dt_xla / 1e12, 1),
            "pallas_tflops": round(flop / dt_pl / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
