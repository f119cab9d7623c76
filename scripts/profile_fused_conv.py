"""Fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composition, on the real
TPU at the VAE's three hot levels (marginal-cost timing; params perturbed).

Usage: timeout 590 python scripts/profile_fused_conv.py [--batch 16]
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

    from genpercept_tpu.ops import conv2d, group_norm
    from genpercept_tpu.ops.fused_conv import fused_gn_silu_conv3x3

    for hw, c in ((768, 128), (384, 256), (192, 512)):
        key = jax.random.key(hw)
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.bfloat16)
        p = {
            "gs": jnp.abs(jax.random.normal(ks[1], (c,), jnp.float32)),
            "gb": jax.random.normal(ks[2], (c,), jnp.float32),
            "cw": jax.random.normal(ks[3], (3, 3, c, c), jnp.bfloat16) * 0.05,
            "cb": jax.random.normal(ks[4], (c,), jnp.float32),
        }
        res = jax.random.normal(ks[0], (b, hw, hw, c), jnp.bfloat16)

        def xla(p, x):
            y = conv2d(jax.nn.silu(group_norm(x, p["gs"], p["gb"], 32, 1e-6)),
                       p["cw"], p["cb"])
            return y + res

        def fused(p, x):
            return fused_gn_silu_conv3x3(x, p["gs"], p["gb"], p["cw"], p["cb"],
                                         residual=res)

        flops = 2 * 9 * b * hw * hw * c * c
        for name, fn in (("xla_gn_silu_conv_add", xla),
                         ("fused_kernel", fused)):
            try:
                dt = marginal_time(fn, p, x)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"level": f"{hw}@{c}", "op": name,
                                  "error": str(e)[:120]}))
                continue
            print(json.dumps({
                "level": f"{hw}@{c}", "op": name,
                "ms": round(dt * 1000, 2),
                "tflops": round(flops / dt / 1e12, 1),
            }))


if __name__ == "__main__":
    main()
