"""Normalization ops (NHWC layout), numerically matching torch semantics.

GroupNorm: per-sample, per-group mean/var over (spatial, channels-in-group),
biased variance, like torch.nn.GroupNorm. The SD2.1 stack uses 32 groups with
eps=1e-5 in resnet/VAE blocks and eps=1e-6 in the Transformer2D input norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """x: (..., H, W, C) NHWC. scale/bias: (C,). Stats in fp32."""
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    cg = c // g
    xf = x.astype(jnp.float32).reshape(n, -1, g, cg)  # (N, S, G, Cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape((n,) + spatial + (c,))
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """LayerNorm over the last axis, stats in fp32 (torch semantics)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
