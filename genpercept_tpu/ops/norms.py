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
    native_apply: bool = False,
) -> jax.Array:
    """x: (..., H, W, C) NHWC. scale/bias: (C,). Stats in fp32.

    TPU-friendly formulation: group stats are computed by summing per-channel
    sums into groups (a (C,) -> (G,) segment reduction), and normalization
    happens in the native NHWC layout with per-channel broadcast factors —
    no reshape to (..., G, C/G), whose 4-wide lane dimension thrashes the
    (8, 128) vector layout.

    native_apply: do the y = x*a + b elementwise apply in x's dtype instead
    of fp32 (stats stay fp32). Used by the TRAINING decode path under
    rematerialization: the fp32 apply makes XLA hold full-resolution fp32
    temps in the decoder backward (2 x 1.14 GB at 768^2 micro-batch 4,
    measured — see scripts/bench_train.py), which is what blocks micro-batch
    4 from fitting the 16 GB chip. Inference keeps the fp32 apply (exact
    parity with the oracle-tested numerics)."""
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    cg = c // g
    count = (x.size // (n * c)) * cg

    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(1, x.ndim - 1))
    sum_c = jnp.sum(xf, axis=reduce_axes)  # (N, C)
    sumsq_c = jnp.sum(xf * xf, axis=reduce_axes)
    sum_g = jnp.sum(sum_c.reshape(n, g, cg), axis=-1)  # (N, G)
    sumsq_g = jnp.sum(sumsq_c.reshape(n, g, cg), axis=-1)
    mean_g = sum_g / count
    # clamp: one-pass E[x^2]-mean^2 can go slightly negative in fp32 via
    # catastrophic cancellation (~590k-element sums at 768^2), which would
    # make rsqrt(var+eps) NaN
    var_g = jnp.maximum(sumsq_g / count - mean_g * mean_g, 0.0)

    inv_g = jax.lax.rsqrt(var_g + eps)  # (N, G)
    # per-channel affine folded with the group stats: y = x*a + b
    inv_c = jnp.repeat(inv_g, cg, axis=-1)  # (N, C)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    if native_apply and orig_dtype != jnp.float32:
        return x * a.reshape(bshape).astype(orig_dtype) \
            + b.reshape(bshape).astype(orig_dtype)
    out = xf * a.reshape(bshape) + b.reshape(bshape)
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
