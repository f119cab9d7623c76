"""Eval-time affine alignment of affine-invariant predictions to metric GT.

Rebuild of `src/util/alignment.py`: least-squares (scale, shift) fit on
masked pixels with optional nearest-neighbor downsampling, plus
depth<->disparity conversion. Exposed both as numpy (drop-in for the offline
eval CLI) and as a jittable JAX path used by the batched on-device evaluator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_downsample_np(x: np.ndarray, scale: float) -> np.ndarray:
    """Reference downsample semantics, faithfully (alignment.py:46-54):
    the reference feeds the squeezed (H, W) array to nn.Upsample as a 3-D
    (1, H, W) tensor, which torch treats as (N, C, L) and interpolates 1-D
    over the LAST dim only — so only W shrinks (out size floor(w*scale),
    src index floor(i/scale)); H is untouched. Verified against the real
    reference module in tests/test_reference_oracle.py."""
    w = x.shape[-1]
    ow = int(w * scale)
    xs = np.minimum((np.arange(ow) / scale).astype(int), w - 1)
    return x[..., xs]


def align_depth_least_square(
    gt_arr: np.ndarray,
    pred_arr: np.ndarray,
    valid_mask_arr: np.ndarray,
    return_scale_shift: bool = True,
    max_resolution: Optional[int] = None,
):
    """alignment.py:29-76: lstsq (scale, shift) on masked pixels."""
    ori_shape = pred_arr.shape
    gt = np.squeeze(gt_arr)
    pred = np.squeeze(pred_arr)
    valid = np.squeeze(valid_mask_arr)

    if max_resolution is not None:
        scale_factor = float(np.min(max_resolution / np.array(gt.shape[-2:])))
        if scale_factor < 1:
            gt = _nearest_downsample_np(gt, scale_factor)
            pred = _nearest_downsample_np(pred, scale_factor)
            valid = _nearest_downsample_np(valid.astype(np.float32), scale_factor) > 0.5

    gt_m = gt[valid].reshape(-1, 1)
    pred_m = pred[valid].reshape(-1, 1)
    A = np.concatenate([pred_m, np.ones_like(pred_m)], axis=-1)
    X = np.linalg.lstsq(A, gt_m, rcond=None)[0]
    scale, shift = float(X[0, 0]), float(X[1, 0])

    aligned = (pred_arr * scale + shift).reshape(ori_shape)
    if return_scale_shift:
        return aligned, scale, shift
    return aligned


def align_depth_least_square_jax(
    gt: jax.Array, pred: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Jittable per-sample closed-form (s, t): same normal equations as the
    numpy lstsq, batched (B, H, W) -> aligned (B, H, W), s, t."""
    m = valid.astype(jnp.float32)
    a00 = jnp.sum(m * pred * pred, axis=(-1, -2))
    a01 = jnp.sum(m * pred, axis=(-1, -2))
    a11 = jnp.sum(m, axis=(-1, -2))
    b0 = jnp.sum(m * pred * gt, axis=(-1, -2))
    b1 = jnp.sum(m * gt, axis=(-1, -2))
    det = a00 * a11 - a01 * a01
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    s = (a11 * b0 - a01 * b1) / safe
    t = (-a01 * b0 + a00 * b1) / safe
    aligned = pred * s[..., None, None] + t[..., None, None]
    return aligned, s, t


def depth2disparity(depth, return_mask: bool = False):
    """alignment.py:80-90 (numpy or jax arrays)."""
    xp = jnp if isinstance(depth, jax.Array) else np
    mask = depth > 0
    disparity = xp.where(mask, 1.0 / xp.where(mask, depth, 1.0), 0.0)
    if return_mask:
        return disparity, mask
    return disparity


def disparity2depth(disparity, **kwargs):
    return depth2disparity(disparity, **kwargs)
