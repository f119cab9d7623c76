"""Phase-level timing of the int8 VAE halves on the real TPU: quantized
encode and decode in isolation (marginal loop-carried cost), to localize any
gap between the micro-bench conv speedups and the end-to-end pipeline win.

Usage: timeout 1200 python scripts/profile_int8_phases.py [--batch 16]
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


def marginal(fn, *args, n_lo=2, n_hi=8):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(a, n):
        def body(i, carry):
            acc, x = carry
            out = fn(x, *a[1:])
            s = jnp.sum(out).astype(jnp.float32)
            x = x * (1.0 + s.astype(x.dtype) * 1e-30)
            return (acc + s, x)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), a[0]))[0]

    float(run_n(args, n_lo))
    float(run_n(args, n_hi))
    t0 = time.perf_counter()
    float(run_n(args, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(args, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--symmetric", action="store_true",
                    help="time the symmetric int8 scheme instead of the "
                         "production asymmetric (zero-point) one")
    args = ap.parse_args()
    b = args.batch

    from __graft_entry__ import _flagship_models
    from genpercept_tpu.models import vae_decode, vae_encode
    from genpercept_tpu.ops.quant import (
        calibrate_chunked, make_calib_conv_fn, make_quant_conv_fn,
        quantize_from_stats)

    models = _flagship_models(jnp.bfloat16)
    vae = models.params()["vae"]
    rgb = jax.random.uniform(jax.random.key(1), (b, 768, 768, 3), jnp.bfloat16) * 2 - 1
    z = jax.random.normal(jax.random.key(2), (b, 96, 96, 4), jnp.bfloat16) * 0.3

    @jax.jit
    def calib(p, rgb, z):
        es, ds = {}, {}
        asym = not args.symmetric
        _ = vae_encode(p, rgb, conv_fn=make_calib_conv_fn(es, asymmetric=asym))
        _ = vae_decode(p, z, conv_fn=make_calib_conv_fn(ds, asymmetric=asym))
        return rgb, {"enc": es, "dec": ds}

    _, stats = calibrate_chunked(lambda p, rgb, z: calib(p, rgb, z),
                                 vae, rgb, z, chunk=4)
    qenc = quantize_from_stats(vae, stats["enc"])
    qdec = quantize_from_stats(vae, stats["dec"])

    for name, fn, x in (
        ("encode_bf16", lambda x, p: vae_encode(p, x), rgb),
        ("encode_int8", lambda x, p, q: vae_encode(
            p, x, conv_fn=make_quant_conv_fn(q)), rgb),
        ("decode_bf16", lambda x, p: vae_decode(p, x), z),
        ("decode_int8", lambda x, p, q: vae_decode(
            p, x, conv_fn=make_quant_conv_fn(q)), z),
    ):
        a = (x, vae) if "bf16" in name else (x, vae, qenc if "encode" in name else qdec)
        dt = marginal(fn, *a)
        print(json.dumps({"op": name, "ms": round(dt * 1000, 1)}), flush=True)


if __name__ == "__main__":
    main()
