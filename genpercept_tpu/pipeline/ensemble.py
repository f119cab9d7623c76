"""On-device test-time ensembling of affine-invariant predictions.

The reference (`genpercept/util/ensemble.py:43-205`) moves latents to CPU and
runs scipy BFGS (max_iter=2!) over pairwise RMS distances between scale/
shift-aligned ensemble members, then median-reduces. That is host-bound and
unjittable. Here the same objective is solved on device with a fixed number
of closed-form alternating least-squares rounds:

  repeat K times:
    composite <- median over members of (s_i * d_i + t_i)
    (s_i, t_i) <- closed-form least-squares alignment of d_i to composite
  reduce median (or mean), then min-max to [0, 1] like the reference
  (`ensemble.py:193-203`).

Fully jittable, deterministic, vmappable over batches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _lstsq_scale_shift(pred: jax.Array, target: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form argmin_{s,t} ||s*pred + t - target||^2 (2x2 normal eqs)."""
    a00 = jnp.mean(pred * pred)
    a01 = jnp.mean(pred)
    b0 = jnp.mean(pred * target)
    b1 = jnp.mean(target)
    det = a00 - a01 * a01
    s = (b0 - a01 * b1) / jnp.maximum(det, 1e-12)
    t = b1 - s * a01
    return s, t


def _init_scale_shift(preds: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-member init like the reference (`ensemble.py:95-109`): map each
    member's [min, max] to [0, 1]."""
    lo = jnp.min(preds, axis=(1, 2))
    hi = jnp.max(preds, axis=(1, 2))
    s = 1.0 / jnp.maximum(hi - lo, 1e-6)
    t = -s * lo
    return s, t


@functools.partial(jax.jit, static_argnames=(
    "reduction", "iters", "scale_invariant", "shift_invariant",
    "return_uncertainty"))
def ensemble_predictions(
    preds: jax.Array,
    reduction: str = "median",
    iters: int = 3,
    scale_invariant: bool = True,
    shift_invariant: bool = True,
    return_uncertainty: bool = False,
):
    """preds: (E, H, W) ensemble members -> (H, W) merged in [0, 1]
    (optionally also a per-pixel MAD uncertainty map, cf. ensemble.py:124-140).
    """
    e = preds.shape[0]
    if scale_invariant or shift_invariant:
        s, t = _init_scale_shift(preds)
        if not scale_invariant:
            s = jnp.ones_like(s)
        if not shift_invariant:
            t = jnp.zeros_like(t)

        def round_fn(_, st):
            s, t = st
            aligned = s[:, None, None] * preds + t[:, None, None]
            composite = jnp.median(aligned, axis=0)
            s_new, t_new = jax.vmap(_lstsq_scale_shift, in_axes=(0, None))(
                preds, composite
            )
            if not scale_invariant:
                s_new = jnp.ones_like(s_new)
            if not shift_invariant:
                t_new = jnp.zeros_like(t_new)
            return s_new, t_new

        s, t = jax.lax.fori_loop(0, iters, round_fn, (s, t))
        aligned = s[:, None, None] * preds + t[:, None, None]
    else:
        aligned = preds

    if reduction == "median":
        merged = jnp.median(aligned, axis=0)
    elif reduction == "mean":
        merged = jnp.mean(aligned, axis=0)
    else:
        raise ValueError(reduction)

    uncertainty = jnp.median(jnp.abs(aligned - merged[None]), axis=0)

    # final min-max to [0,1] (reference ensemble.py:193-203)
    lo, hi = jnp.min(merged), jnp.max(merged)
    merged = (merged - lo) / jnp.maximum(hi - lo, 1e-6)
    if return_uncertainty:
        return merged, uncertainty / jnp.maximum(hi - lo, 1e-6)
    return merged
