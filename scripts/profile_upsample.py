"""Micro-profile of the VAE decoder's non-resblock ops on the real TPU:
the three upsampler variants (lhs-dilated 4x4 / naive nearest+conv3x3 /
4-phase 2x2 convs + interleave), the mid-block attention, and the encoder
downsample. Identifies where the ~150 ms gap between sum-of-resblocks and
the measured decoder time lives.

Usage: timeout 590 python scripts/profile_upsample.py [--batch 16]
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


def phase_up2_conv3x3(x, kernel, bias=None):
    """nearest-x2 + conv3x3 via 4 phase convs with 2x2 collapsed kernels and
    a depth-to-space interleave (16 MACs/input pixel, plain stride-1 convs)."""
    kk = kernel.astype(x.dtype)
    n, h, w, ci = x.shape
    co = kk.shape[-1]
    # row-collapsed: dy=0 uses rows (K0, K1+K2) on input rows (i-1, i);
    # dy=1 uses (K0+K1, K2) on rows (i, i+1); same for columns.
    r0 = jnp.stack([kk[0], kk[1] + kk[2]])          # (2,3,Ci,Co)
    r1 = jnp.stack([kk[0] + kk[1], kk[2]])
    g = {}
    for dy, r in ((0, r0), (1, r1)):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # (2,2,Ci,Co)
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        g[(dy, 0)], g[(dy, 1)] = c0, c1
    pads = {0: (1, 0), 1: (0, 1)}
    outs = []
    for dy in (0, 1):
        for dx in (0, 1):
            o = jax.lax.conv_general_dilated(
                x, g[(dy, dx)], (1, 1),
                [pads[dy], pads[dx]],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(o)
    o = jnp.stack(outs, axis=3)  # (N,H,W,4,Co) order (0,0),(0,1),(1,0),(1,1)
    o = o.reshape(n, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(n, 2 * h, 2 * w, co)
    if bias is not None:
        o = o + bias.astype(o.dtype)
    return o


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch

    from genpercept_tpu.models.layers import init_vae_attention, vae_attention
    from genpercept_tpu.ops import conv2d
    from genpercept_tpu.ops.conv import nearest_up2_conv3x3

    # correctness check of the phase decomposition (tiny, on-device)
    kx = jax.random.normal(jax.random.key(0), (2, 8, 8, 16), jnp.float32)
    kw = jax.random.normal(jax.random.key(1), (3, 3, 16, 16), jnp.float32)
    a = nearest_up2_conv3x3(kx, kw)
    bb = phase_up2_conv3x3(kx, kw)
    err = float(jnp.max(jnp.abs(a - bb)))
    print(json.dumps({"check": "phase_vs_dilated_maxerr", "err": err}))

    for hw, c in ((192, 512), (384, 256), (96, 512)):
        x = jax.random.normal(jax.random.key(hw), (b, hw, hw, c), jnp.bfloat16)
        w3 = jax.random.normal(jax.random.key(hw + 1), (3, 3, c, c),
                               jnp.bfloat16) * 0.02

        def dilated(p, x):
            return nearest_up2_conv3x3(x, p)

        def naive(p, x):
            n, h, w_, ci = x.shape
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return conv2d(up, p)

        def phased(p, x):
            return phase_up2_conv3x3(x, p)

        flops = 2 * 16 * b * hw * hw * c * c  # 16 MACs/input px (fused forms)
        naive_flops = 2 * 9 * b * (2 * hw) ** 2 * c * c
        for name, fn, fl in (("up2_lhs_dilated", dilated, flops),
                             ("up2_naive", naive, naive_flops),
                             ("up2_phase_d2s", phased, flops)):
            dt = marginal_time(fn, w3, x)
            print(json.dumps({
                "level": f"{hw}@{c}", "op": name,
                "ms": round(dt * 1000, 2),
                "tflops": round(fl / dt / 1e12, 1),
            }))

    # VAE mid-block attention: 96^2 tokens, one head of dim 512
    x = jax.random.normal(jax.random.key(7), (b, 96, 96, 512), jnp.bfloat16)
    p = jax.tree.map(lambda t: t.astype(jnp.bfloat16),
                     init_vae_attention(jax.random.key(8), 512))

    def attn(p, x):
        return vae_attention(p, x)

    dt = marginal_time(attn, p, x)
    attn_flops = 4 * b * 9216 * 9216 * 512 + 8 * b * 9216 * 512 * 512
    print(json.dumps({
        "level": "96@512", "op": "vae_attention",
        "ms": round(dt * 1000, 2),
        "tflops": round(attn_flops / dt / 1e12, 1),
    }))

    # encoder downsample (stride-2, asymmetric pad)
    x = jax.random.normal(jax.random.key(9), (b, 768, 768, 128), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.key(10), (3, 3, 128, 128), jnp.bfloat16) * 0.02

    def down(p, x):
        return conv2d(x, p, stride=2, padding=((0, 1), (0, 1)))

    dt = marginal_time(down, w3, x)
    print(json.dumps({
        "level": "768@128", "op": "downsample_s2",
        "ms": round(dt * 1000, 2),
        "tflops": round(2 * 9 * b * 384 * 384 * 128 * 128 / dt / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
