"""The 10 depth evaluation metrics + MetricTracker, jittable JAX.

Exact rebuild of `src/util/metric.py:34-158` (same per-sample reductions:
per-image masked mean, then batch mean; silog multiplied by 100). All
functions take (B, H, W) arrays + boolean masks and are vmappable/jittable —
the reference evaluates per-sample on GPU tensors; here whole eval batches
run as one XLA program.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _per_image_mean(value: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is not None:
        value = jnp.where(mask, value, 0.0)
        n = jnp.sum(mask, axis=(-1, -2))
    else:
        n = value.shape[-1] * value.shape[-2]
    return jnp.sum(value, axis=(-1, -2)) / n


def abs_relative_difference(pred, target, valid_mask=None):
    return jnp.mean(_per_image_mean(jnp.abs(pred - target) / target, valid_mask))


def squared_relative_difference(pred, target, valid_mask=None):
    return jnp.mean(_per_image_mean((pred - target) ** 2 / target, valid_mask))


def rmse_linear(pred, target, valid_mask=None):
    return jnp.mean(jnp.sqrt(_per_image_mean((pred - target) ** 2, valid_mask)))


def rmse_log(pred, target, valid_mask=None):
    d = jnp.log(pred) - jnp.log(target)
    d = jnp.where(valid_mask, d, 0.0) if valid_mask is not None else d
    return jnp.mean(jnp.sqrt(_per_image_mean(d**2, valid_mask)))


def log10(pred, target, valid_mask=None):
    d = jnp.abs(jnp.log10(pred) - jnp.log10(target))
    if valid_mask is not None:
        return jnp.sum(jnp.where(valid_mask, d, 0.0)) / jnp.sum(valid_mask)
    return jnp.mean(d)


def threshold_percentage(pred, target, thresh, valid_mask=None):
    ratio = jnp.maximum(pred / target, target / pred)
    bit = (ratio < thresh).astype(jnp.float32)
    return jnp.mean(_per_image_mean(bit, valid_mask))


def delta1_acc(pred, target, valid_mask=None):
    return threshold_percentage(pred, target, 1.25, valid_mask)


def delta2_acc(pred, target, valid_mask=None):
    return threshold_percentage(pred, target, 1.25**2, valid_mask)


def delta3_acc(pred, target, valid_mask=None):
    return threshold_percentage(pred, target, 1.25**3, valid_mask)


def i_rmse(pred, target, valid_mask=None):
    d = 1.0 / pred - 1.0 / target
    d = jnp.where(valid_mask, d, 0.0) if valid_mask is not None else d
    return jnp.mean(jnp.sqrt(_per_image_mean(d**2, valid_mask)))


def silog_rmse(pred, target, valid_mask=None):
    d = jnp.log(pred) - jnp.log(target)
    if valid_mask is not None:
        d = jnp.where(valid_mask, d, 0.0)
        n = jnp.sum(valid_mask, axis=(-1, -2))
    else:
        n = target.shape[-1] * target.shape[-2]
    first = jnp.sum(d**2, axis=(-1, -2)) / n
    second = jnp.sum(d, axis=(-1, -2)) ** 2 / (n**2)
    # first - second == Var[d] >= 0 mathematically; clamp fp32 cancellation
    return jnp.sqrt(jnp.maximum(jnp.mean(first - second), 0.0)) * 100.0


METRIC_FUNCS = {
    "abs_relative_difference": abs_relative_difference,
    "squared_relative_difference": squared_relative_difference,
    "rmse_linear": rmse_linear,
    "rmse_log": rmse_log,
    "log10": log10,
    "delta1_acc": delta1_acc,
    "delta2_acc": delta2_acc,
    "delta3_acc": delta3_acc,
    "i_rmse": i_rmse,
    "silog_rmse": silog_rmse,
}


def compute_metrics(pred, target, valid_mask=None, names=None) -> Dict[str, jax.Array]:
    """All metrics in one jittable call. pred/target: (B, H, W) metric depth."""
    if pred.ndim == 2:
        pred, target = pred[None], target[None]
        if valid_mask is not None:
            valid_mask = valid_mask[None]
    names = names or list(METRIC_FUNCS)
    return {n: METRIC_FUNCS[n](pred, target, valid_mask) for n in names}


class MetricTracker:
    """Streaming mean accumulator (reference metric.py:10-31, pandas-based;
    here a plain dict since eval batches already reduce on device)."""

    def __init__(self, *keys: str):
        self._totals = {k: 0.0 for k in keys}
        self._counts = {k: 0 for k in keys}

    def reset(self):
        for k in self._totals:
            self._totals[k] = 0.0
            self._counts[k] = 0

    def update(self, key: str, value: float, n: int = 1):
        if key not in self._totals:
            self._totals[key] = 0.0
            self._counts[key] = 0
        self._totals[key] += float(value) * n
        self._counts[key] += n

    def avg(self, key: str) -> float:
        return self._totals[key] / max(self._counts[key], 1)

    def result(self) -> Dict[str, float]:
        return {k: self.avg(k) for k in self._totals}
