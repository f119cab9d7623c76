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


def _lerp_weights_align_corners(n_in: int, n_out: int):
    if n_out == 1 or n_in == 1:
        idx = jnp.zeros((n_out,), jnp.int32)
        return idx, idx, jnp.zeros((n_out,), jnp.float32)
    src = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.minimum(lo + 1, n_in - 1)
    return lo, hi, src - lo


def resize_bilinear_align_corners(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True (torch semantics): corner
    pixels map exactly; src = i * (in-1)/(out-1). Needed by the DPT fusion
    stage and head, which use nn.Upsample(align_corners=True)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ylo, yhi, yf = _lerp_weights_align_corners(h, oh)
    xlo, xhi, xf_w = _lerp_weights_align_corners(w, ow)
    top = xf[:, ylo]
    bot = xf[:, yhi]
    rows = top + (bot - top) * yf[None, :, None, None]
    left = rows[:, :, xlo]
    right = rows[:, :, xhi]
    out = left + (right - left) * xf_w[None, None, :, None]
    return out.astype(dtype)


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
