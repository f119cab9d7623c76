"""Timestep (sinusoidal) embeddings matching diffusers' conventions for SD2.1.

diffusers `get_timestep_embedding` with flip_sin_to_cos=True,
downscale_freq_shift=0: emb = [cos | sin] of t * exp(-ln(10000) * i / half).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype=jnp.float32,
) -> jax.Array:
    """timesteps: (B,) int or float -> (B, dim)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)
