"""Batched, sharded evaluation harness.

The reference evaluates one sample at a time with per-sample numpy lstsq
(`infer.py`/`eval.py`, SURVEY §6). Eval datasets have fixed raster sizes
(NYU 480x640, KITTI crop 352x1216, ScanNet 480x640, DIODE 768x1024, ...),
so here whole batches run as ONE XLA program — inference, least-squares
alignment (closed-form, vmapped), clipping and all 10 metrics on device —
optionally sharded over the `data` mesh axis.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.data import DatasetMode
from genpercept_tpu.eval.alignment import align_depth_least_square_jax
from genpercept_tpu.eval.metrics import METRIC_FUNCS
from genpercept_tpu.pipeline import PipelineConfig, build_single_infer

logger = logging.getLogger(__name__)


def build_eval_step(models, pipe_cfg: PipelineConfig, min_depth: float,
                    max_depth: float, alignment: str = "least_square"):
    """Returns eval_step(params, rgb01, gt, valid) -> {metric: scalar sums
    over the batch, n: count} — one jitted program per raster shape."""
    infer = build_single_infer(models, pipe_cfg)
    max_d = float(min(max_depth, 1e8))

    def eval_step(params, rgb01, gt, valid):
        pred = infer(params, rgb01)  # (B, H, W) in [0,1]
        if pred.shape[1:] != gt.shape[1:]:
            from genpercept_tpu.ops.resize import resize

            pred = resize(pred[..., None], gt.shape[1:3], "bilinear")[..., 0]
        if alignment == "least_square":
            pred, _, _ = align_depth_least_square_jax(gt, pred, valid)
        elif alignment == "least_square_disparity":
            # mask includes pred>0; aligned disparity clips at 1e-3
            # (reference eval.py:177-197)
            gt_disp = jnp.where(gt > 0, 1.0 / jnp.maximum(gt, 1e-8), 0.0)
            aligned, _, _ = align_depth_least_square_jax(
                gt_disp, pred, valid & (gt > 0) & (pred > 0)
            )
            pred = 1.0 / jnp.clip(aligned, 1e-3, None)
        pred = jnp.clip(pred, min_depth, max_d)
        pred = jnp.clip(pred, 1e-6, None)
        out = {
            name: fn(pred, gt, valid) for name, fn in METRIC_FUNCS.items()
        }
        return out

    return eval_step


def evaluate_dataset(
    models,
    dataset,
    mode: str = "depth",
    batch_size: int = 4,
    alignment: str = "least_square",
    processing_res: int = 768,
    mesh=None,
    dtype=jnp.bfloat16,
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """Run the full eval protocol over a dataset, batched on device."""
    pipe_cfg = PipelineConfig(mode=mode, processing_res=processing_res,
                              match_input_res=False, dtype=dtype)
    step = jax.jit(
        build_eval_step(models, pipe_cfg, dataset.min_depth, dataset.max_depth,
                        alignment)
    )
    params = models.params()

    totals: Dict[str, float] = {k: 0.0 for k in METRIC_FUNCS}
    n_samples = 0
    n = min(len(dataset), limit) if limit else len(dataset)
    buf = []
    for i in range(n):
        item = dataset[i]
        buf.append(item)
        if len(buf) < batch_size and i != n - 1:
            continue
        rgb01 = jnp.asarray(
            np.stack([(s["rgb_norm"] + 1.0) / 2.0 for s in buf]), jnp.float32
        )
        gt = jnp.asarray(np.stack([s["depth_raw_linear"] for s in buf]), jnp.float32)
        valid = jnp.asarray(np.stack([s["valid_mask_raw"] for s in buf]))
        if mesh is not None:
            from genpercept_tpu.parallel import batch_sharding

            if rgb01.shape[0] % mesh.shape["data"] == 0:
                rgb01, gt, valid = jax.device_put(
                    (rgb01, gt, valid), batch_sharding(mesh)
                )
        out = step(params, rgb01, gt, valid)
        # weight each batch by its sample count so a smaller final batch is
        # not over-weighted (matches the reference's per-sample MetricTracker
        # averaging, metric.py:10-31)
        bsz = len(buf)
        for k, v in out.items():
            totals[k] += float(v) * bsz
        n_samples += bsz
        buf = []
    return {k: v / max(n_samples, 1) for k, v in totals.items()}
