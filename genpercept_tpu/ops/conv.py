"""Convolution wrappers in NHWC / HWIO layout (TPU-native).

Weights are stored HWIO; the safetensors importer transposes torch's OIHW.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, int, Tuple[int, int]] = 1,
) -> jax.Array:
    """2D conv, NHWC input, HWIO kernel. Accumulate in fp32 on the MXU."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple) and padding and isinstance(padding[0], tuple):
        padding = list(padding)  # explicit ((top,bottom),(left,right))
    elif isinstance(padding, tuple):
        padding = [padding, padding]
    # NOTE: no preferred_element_type here — bf16 convs accumulate in fp32
    # on the MXU natively, and a fp32-typed output breaks the transposed-conv
    # gradient rule (cotangent fp32 vs bf16 operands).
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=_DIMS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def nearest_up2_conv3x3(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None
) -> jax.Array:
    """conv3x3(nearest_upsample_x2(x)) computed EXACTLY without materializing
    the upsampled tensor, via the 4-phase subpixel decomposition.

    For output phase (dy, dx) in {0,1}^2 the 3x3 taps on the nearest-
    upsampled grid collapse onto a 2x2 window of the ORIGINAL grid:
      O[2i+dy, 2j+dx] = sum_{a,b in {0,1}} G[dy,dx][a,b] . X[i-1+dy+a, j-1+dx+b]
    with row-collapsed weights (dy=0: rows (K0, K1+K2); dy=1: (K0+K1, K2))
    and the same for columns. 16 MACs per input pixel instead of the naive
    36 (4 output pixels x 9 taps) — a 2.25x FLOP cut on every
    Upsample2D(use_conv=True) in the SD2.1 VAE decoder and UNet up blocks
    (diffusers Upsample2D; reference pipeline hot path
    genpercept_pipeline.py:507-526).

    x: (N, H, W, Ci), kernel: (3, 3, Ci, Co) HWIO -> (N, 2H, 2W, Co).
    """
    assert kernel.shape[:2] == (3, 3)
    kk = kernel.astype(x.dtype)

    # Expressed as ONE lhs-dilated conv (the conv-backprop form the TPU conv
    # emitter lowers natively — no interleave/stack temps in HBM): the
    # nearest-x2 "spread" composes with the 3x3 taps into a 4x4 kernel
    #   T = [K0, K0+K1, K1+K2, K2]  (per dimension, separable collapse)
    # applied to the 2x-dilated input with padding 2.
    r = jnp.concatenate(
        [kk[:1], kk[:1] + kk[1:2], kk[1:2] + kk[2:3], kk[2:3]], axis=0
    )  # (4, 3, Ci, Co)
    g = jnp.concatenate(
        [r[:, :1], r[:, :1] + r[:, 1:2], r[:, 1:2] + r[:, 2:3], r[:, 2:3]],
        axis=1,
    )  # (4, 4, Ci, Co)
    out = jax.lax.conv_general_dilated(
        x, g, window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=_DIMS,
    )  # (N, 2H, 2W, Co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv1x1(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """1x1 conv over the channel axis; kernel (Cin, Cout) or HWIO
    (1,1,Cin,Cout).

    For rank-4 NHWC inputs this goes through the CONV emitter, not an
    einsum: XLA gives dot_general outputs a different tiled layout
    ({3,2,1,0}) than convolutions ({3,0,2,1}), so an einsum here forces a
    full-tensor layout copy on each side inside resblock shortcut paths —
    ~125 ms vs ~48 ms for the decoder's 768^2 channel-reducing resblock."""
    if kernel.ndim == 2:
        kernel = kernel[None, None]
    if x.ndim == 4:
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=_DIMS,
        )
    else:
        out = jnp.einsum("...i,io->...o", x, kernel[0, 0].astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
