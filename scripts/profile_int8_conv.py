"""Micro-bench: int8 vs bf16 3x3 conv on the real TPU.

Validates the premise of the W8A8 VAE path: the v5e MXU runs s8xs8->s32 at
2x the bf16 rate (~394 TOPS peak). If XLA routes
conv_general_dilated(int8, int8, preferred_element_type=int32) through the
MXU int8 path, a quantized VAE decode halves its ~92%-MFU bf16 conv time.

Usage: timeout 590 python scripts/profile_int8_conv.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp


def marginal_time(fn, x, w, n_lo=2, n_hi=8):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(x, w, n):
        def body(i, carry):
            acc, xx = carry
            out = fn(xx, w)
            s = jnp.sum(out.astype(jnp.float32))
            # loop-carried dependency: runtime-zero (but not provably zero)
            # epsilon of the output feeds back into the input
            if xx.dtype == jnp.int8:
                xx = xx + (s * 1e-30).astype(jnp.int8)
            else:
                xx = xx * (1.0 + s.astype(xx.dtype) * 1e-30)
            return (acc + s, xx)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), x))[0]

    float(run_n(x, w, n_lo))
    float(run_n(x, w, n_hi))
    t0 = time.perf_counter()
    float(run_n(x, w, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(x, w, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def conv_int8_deq(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)


def main():
    from genpercept_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.key(0)
    # decoder hot shapes: (b, H, W, C) with 3x3 CxC kernels
    shapes = [
        (16, 192, 192, 512),   # up1
        (16, 384, 384, 256),   # up2
        (16, 768, 768, 128),   # up3
        (16, 96, 96, 512),     # mid/up0
    ]
    for (b, h, w, c) in shapes:
        kx, kw = jax.random.split(jax.random.fold_in(key, c * h))
        xf = jax.random.normal(kx, (b, h, w, c), jnp.bfloat16)
        wf = jax.random.normal(kw, (3, 3, c, c), jnp.bfloat16) * 0.02
        xi = jax.random.randint(kx, (b, h, w, c), -127, 128, jnp.int8)
        wi = jax.random.randint(kw, (3, 3, c, c), -127, 128, jnp.int8)
        flops = 2 * 9 * c * c * b * h * w
        for name, fn, xx, ww in (
            ("bf16", conv_bf16, xf, wf),
            ("int8", conv_int8, xi, wi),
            ("int8_deq", conv_int8_deq, xi, wi),
        ):
            try:
                dt = marginal_time(fn, xx, ww)
                print(json.dumps({
                    "shape": f"{b}x{h}x{w}x{c}", "kind": name,
                    "ms": round(dt * 1000, 2),
                    "tflops": round(flops / dt / 1e12, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "shape": f"{b}x{h}x{w}x{c}", "kind": name,
                    "error": str(e)[:160],
                }), flush=True)


if __name__ == "__main__":
    main()
