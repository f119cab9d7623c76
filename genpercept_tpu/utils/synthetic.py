"""Heavy-tailed synthetic weights + natural-image-like calibration inputs.

Purpose: de-risk the int8 PTQ calibration before real checkpoints are
reachable (this environment has no egress; see scripts/download_weights.sh).
Every fidelity number in-tree was historically measured on uniform-init
weights, whose per-channel ranges are flat and tail-free — trained SD2.1
weights are NOT like that. Published analyses of SD/LLM quantization
(SmoothQuant, AWQ, the well-known fp16-overflow of the SD VAE decoder
mid-block) consistently show (a) per-channel weight norms spread over ~2
orders of magnitude, (b) a few channels carrying large activation outliers,
driven by GroupNorm affine gains, and (c) heavy-tailed (leptokurtic)
per-channel weight distributions. This module synthesizes exactly those
three properties on top of the random-init model so the calibration
(per-channel activation scales, MSE clip search, bias correction,
weight-side clip) is stress-tested against them.

Not a substitute for real-weight parity (scripts/parity_real.py runs the
minute weights exist) — a surrogate that fails loudly if the PTQ scheme
only worked because init weights were easy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heavy_tail_params(params, key, *, df: float = 4.0,
                      channel_sigma: float = 1.0,
                      gn_sigma: float = 0.5,
                      gn_outlier_frac: float = 0.03,
                      gn_outlier_gain: float = 12.0):
    """Re-draw every weight leaf with heavy-tailed statistics, preserving
    shapes/dtypes and each leaf's original RMS (so activation magnitudes
    stay in a sane range and the model still runs end-to-end).

    - conv/linear weights: Student-t(df) entries x per-output-channel
      log-normal scale (sigma=channel_sigma) -> kurtosis + channel spread;
    - norm scales ('weight' of a (C,) pair next to a 'bias'): log-normal
      gains around 1 with sigma=gn_sigma, plus a random gn_outlier_frac of
      channels boosted by gn_outlier_gain — the GroupNorm-driven activation
      outlier channels documented for the SD VAE decoder;
    - biases: left as drawn (zeros at init) — bias adds no quantization
      stress.
    """
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, max(len(paths_leaves), 1))

    def is_norm_scale(path, leaf):
        # (C,) 'weight' leaves are norm gains in this tree (conv/linear
        # weights are >=2-D); '(C,) bias' stays untouched
        return path.endswith(".weight") and leaf.ndim == 1

    out = []
    for (kp, leaf), k in zip(paths_leaves, keys):
        path = ".".join(str(getattr(e, "key", e)) for e in kp)
        if not path.endswith(".weight"):
            out.append(leaf)
            continue
        if is_norm_scale(path, leaf):
            k1, k2 = jax.random.split(k)
            gains = jnp.exp(gn_sigma * jax.random.normal(k1, leaf.shape))
            boost = jax.random.uniform(k2, leaf.shape) < gn_outlier_frac
            gains = jnp.where(boost, gains * gn_outlier_gain, gains)
            out.append(gains.astype(leaf.dtype))
            continue
        k1, k2 = jax.random.split(k)
        t = jax.random.t(k1, df, leaf.shape, jnp.float32)
        # per-output-channel scale (last axis for HWIO conv and (in,out)
        # linear layouts alike)
        ch = jnp.exp(channel_sigma * jax.random.normal(k2, (leaf.shape[-1],)))
        w = t * ch
        rms_old = jnp.sqrt(jnp.mean(jnp.square(leaf.astype(jnp.float32))) + 1e-12)
        rms_new = jnp.sqrt(jnp.mean(jnp.square(w)) + 1e-12)
        out.append((w * (rms_old / rms_new)).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def natural_like_images(key, batch: int, res: int) -> jax.Array:
    """(B, res, res, 3) in [0, 1]: smooth low-frequency gradients + hard
    rectangles + mild noise — closer to natural-image statistics (spatially
    correlated, edge-bearing) than uniform noise, for calibration inputs."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, res), jnp.linspace(0, 1, res),
                          indexing="ij")
    # low-frequency planes with random orientation per image/channel
    ang = jax.random.uniform(k1, (batch, 1, 1, 3), minval=0, maxval=2 * jnp.pi)
    phase = jax.random.uniform(k2, (batch, 1, 1, 3), minval=0, maxval=1)
    base = 0.5 + 0.4 * jnp.sin(
        2 * jnp.pi * (jnp.cos(ang) * yy[None, :, :, None]
                      + jnp.sin(ang) * xx[None, :, :, None] + phase))
    # hard-edged rectangles (one per image)
    c = jax.random.uniform(k3, (batch, 4))
    y0, x0 = c[:, 0] * 0.6, c[:, 1] * 0.6
    y1, x1 = y0 + 0.2 + 0.2 * c[:, 2], x0 + 0.2 + 0.2 * c[:, 3]
    inside = ((yy[None] >= y0[:, None, None]) & (yy[None] <= y1[:, None, None])
              & (xx[None] >= x0[:, None, None]) & (xx[None] <= x1[:, None, None]))
    img = jnp.where(inside[..., None], 1.0 - base, base)
    img = img + 0.02 * jax.random.normal(k4, (batch, res, res, 3))
    return jnp.clip(img, 0.0, 1.0)
