"""Multi-resolution (pyramid) noise for marigold-style training.

Rebuild of `src/util/multi_res_noise.py:9-75`: a sum of bilinear-upsampled
gaussians at progressively coarser resolutions, weighted strength^i, then
rescaled to unit variance. The reference's `original`/`random_step`
strategies draw a continuous random downscale ratio in [2, 4) per call
(multi_res_noise.py:30,44) — a data-dependent shape, impossible under jit.
Here the ratio only ever enters through `int(h / ratio**i)`, so the
continuous draw induces a distribution over finitely many shape pyramids;
we quantize it to `_N_RATIO_BINS` midpoints and pick the pyramid with a
traced `lax.switch`, which keeps the function pure and jittable with the
reference's default strategy.
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp

_N_RATIO_BINS = 8


def _upsample_bilinear(x: jax.Array, out_hw) -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), "linear")


def multi_res_noise_like(
    key: jax.Array,
    shape,  # (B, H, W, C)
    strength: Union[float, jax.Array] = 0.9,
    downscale_strategy: str = "original",
    dtype=jnp.float32,
) -> jax.Array:
    b, h, w, c = shape
    if isinstance(strength, jax.Array) and strength.ndim > 0:
        strength = strength.reshape((-1, 1, 1, 1))

    key, k0 = jax.random.split(key)
    noise = jax.random.normal(k0, shape, dtype)

    if downscale_strategy in ("original", "random_step"):
        def pyramid(ratio: float, pkey) -> jax.Array:
            acc = jnp.zeros(shape, dtype)
            ch, cw = h, w
            for i in range(10):
                if downscale_strategy == "original":
                    ch = max(1, int(h / (ratio**i)))
                    cw = max(1, int(w / (ratio**i)))
                else:  # random_step: repeated division by the same ratio
                    ch = max(1, int(ch / ratio))
                    cw = max(1, int(cw / ratio))
                pkey, ki = jax.random.split(pkey)
                g = jax.random.normal(ki, (b, ch, cw, c), dtype)
                acc = acc + _upsample_bilinear(g, (h, w)) * (strength**i)
                if ch == 1 or cw == 1:
                    break
            return acc

        ratios = [
            2.0 + 2.0 * (j + 0.5) / _N_RATIO_BINS for j in range(_N_RATIO_BINS)
        ]
        idx = jax.random.randint(
            jax.random.fold_in(key, 17), (), 0, _N_RATIO_BINS
        )
        key = jax.random.fold_in(key, 18)
        noise = noise + jax.lax.switch(
            idx, [lambda k, r=r: pyramid(r, k) for r in ratios], key
        )
    elif downscale_strategy == "every_layer":
        ch, cw = h, w
        for i in range(int(math.log2(min(h, w)))):
            ch, cw = max(1, ch // 2), max(1, cw // 2)
            key, ki = jax.random.split(key)
            g = jax.random.normal(ki, (b, ch, cw, c), dtype)
            noise = noise + _upsample_bilinear(g, (h, w)) * (strength**i)
    elif downscale_strategy == "power_of_two":
        for i in range(10):
            ch = max(1, int(h / 2**i))
            cw = max(1, int(w / 2**i))
            key, ki = jax.random.split(key)
            g = jax.random.normal(ki, (b, ch, cw, c), dtype)
            noise = noise + _upsample_bilinear(g, (h, w)) * (strength**i)
            if ch == 1 or cw == 1:
                break
    else:
        raise ValueError(f"unknown downscale strategy: {downscale_strategy}")

    return noise / jnp.std(noise)
