"""Device-side image resize matching torchvision semantics.

The reference resizes with torchvision `Resize(..., antialias=True)` for
bilinear/bicubic and `nearest-exact` for labels (reference
`genpercept/util/image_util.py:75-126`). Shapes here are static at trace
time, so everything stays inside jit.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_METHODS = {"bilinear": "linear", "bicubic": "cubic"}


def resize(
    x: jax.Array,
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """x: (N, H, W, C) -> (N, out_h, out_w, C)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if method in ("nearest", "nearest_exact", "nearest-exact"):
        return _nearest_exact(x, (oh, ow))
    out = jax.image.resize(
        x.astype(jnp.float32),
        (n, oh, ow, c),
        method=_METHODS[method],
        antialias=antialias,
    )
    return out.astype(x.dtype)


def _nearest_exact(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch 'nearest-exact': src index = floor((i + 0.5) * in/out)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    ys = jnp.clip(
        jnp.floor((jnp.arange(oh) + 0.5) * (h / oh)).astype(jnp.int32), 0, h - 1
    )
    xs = jnp.clip(
        jnp.floor((jnp.arange(ow) + 0.5) * (w / ow)).astype(jnp.int32), 0, w - 1
    )
    return x[:, ys][:, :, xs]


def resize_bilinear_antialias(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    return resize(x, out_hw, method="bilinear", antialias=True)


def max_res_shape(h: int, w: int, max_edge: int) -> Tuple[int, int]:
    """Long-side resize target, aspect preserving, floor like torchvision
    (reference image_util.py:95-100: scale = max_edge/max(h,w), int())."""
    scale = max_edge / max(h, w)
    return max(int(h * scale), 1), max(int(w * scale), 1)


def resize_max_res(
    x: jax.Array, max_edge: int, method: str = "bilinear", antialias: bool = True
) -> jax.Array:
    """Resize so the longer spatial side equals max_edge (static shapes)."""
    h, w = x.shape[1], x.shape[2]
    return resize(x, max_res_shape(h, w, max_edge), method, antialias)
