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


def conv1x1(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """1x1 conv as a matmul over the channel axis; kernel (Cin, Cout) or
    HWIO (1,1,Cin,Cout)."""
    if kernel.ndim == 4:
        kernel = kernel[0, 0]
    out = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
