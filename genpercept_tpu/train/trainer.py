"""Training orchestration: the GenPerceptTrainer equivalent.

Rebuild of `src/trainer/genpercept_trainer.py:79-1355` around the jitted
`build_train_step`: epoch/batch bookkeeping with batch-exact resume
(skip_first_batches + per-iteration seed-sequence replay), periodic
validation (runs the real inference pipeline on held-out splits and tracks
abs_rel, :1021-1243), visualization, checkpoint save/rotate/resume, and
exit-after time budgeting (accelerate_train.py:104-109).

Host concerns (loaders, logging, checkpoints) live here; everything numeric
is inside the jitted step.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpercept_tpu.data.sampler import skip_first_batches
from genpercept_tpu.eval import align_depth_least_square, compute_metrics
from genpercept_tpu.eval.metrics import MetricTracker
from genpercept_tpu.train.train_step import (
    TrainConfig,
    build_train_step,
    init_train_state,
    merge_vae,
)
from genpercept_tpu.utils.logging_util import MetricsLogger, eval_dic_to_text
from genpercept_tpu.utils.seeding import generate_seed_sequence

logger = logging.getLogger(__name__)

GT_KEYS = {
    "depth": ("depth_raw_norm", "valid_mask_raw"),
    "normal": ("normal_raw_norm", "valid_mask_raw_normal"),
    "matting": ("matting_raw_norm", "valid_mask_raw_matting"),
    "dis": ("dis_raw_norm", "valid_mask_raw_dis"),
    "seg": ("seg_raw_norm", "valid_mask_raw_seg"),
    "disparity": ("depth_raw_norm", "valid_mask_raw"),
    "disparity_dpt_head": ("depth_raw_norm", "valid_mask_raw"),
}


class _NullMetricsLogger:
    """No-op logger for non-zero processes in multi-host runs."""

    def log_scalar(self, tag, value, step):
        pass

    def log_dict(self, d, step, prefix=""):
        pass


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        models,  # GenPerceptModels
        train_loader,
        out_dir: str,
        val_loaders: Optional[Dict[str, object]] = None,
        max_iter: int = 30000,
        save_period: int = 50,
        val_period: int = 0,
        vis_period: int = 0,
        vis_loaders: Optional[Dict[str, object]] = None,
        main_seed: Optional[int] = 0,
        mesh=None,
        zero1: bool = False,
    ):
        self.cfg = cfg
        self.models = models
        self.train_loader = train_loader
        self.val_loaders = val_loaders or {}
        self.out_dir = out_dir
        self.max_iter = max_iter
        self.save_period = save_period
        self.val_period = val_period
        self.vis_period = vis_period
        self.vis_loaders = vis_loaders or {}
        self.mesh = mesh

        params = models.params()
        self.trainable, self.frozen, self.tx, self.opt_state = init_train_state(
            params, cfg
        )
        if self.cfg.compute_dtype == jnp.bfloat16:
            # frozen subtrees (VAE, text embed) carry no optimizer state and
            # every matmul casts weights to the activation dtype anyway —
            # storing them bf16 saves HBM with per-op-identical numerics
            # (only fp32-stored GN affine params lose storage precision)
            self.frozen = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.frozen,
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from genpercept_tpu.parallel import (
                shard_opt_state_zero1,
                shard_params_tp,
            )

            self.trainable = shard_params_tp(self.trainable, mesh)
            self.frozen = shard_params_tp(self.frozen, mesh)
            if zero1:
                # optimizer moments sharded across the data axis (the
                # reference's optional DeepSpeed ZeRO hook,
                # accelerate_train.py:198-202)
                self.opt_state = shard_opt_state_zero1(self.opt_state, mesh)
            else:
                self.opt_state = jax.tree.map(
                    lambda x: jax.device_put(x, NamedSharding(mesh, P()))
                    if hasattr(x, "shape") else x,
                    self.opt_state,
                )
        # donate (trainable, opt_state): without donation the step holds the
        # old AND new ~10 GB master/optimizer state simultaneously — an
        # instant OOM for full-UNet training on a 16 GB chip
        self.step_fn = jax.jit(
            build_train_step(cfg, models, self.tx), donate_argnums=(0, 2)
        )

        self.effective_iter = 0
        self.epoch = 0
        self.n_batch_in_epoch = 0
        # reproducible per-iteration rng stream, replayed on resume
        # (seeding.py:37-54 / genpercept_trainer.py:1245-1254)
        self.seed_sequence = generate_seed_sequence(main_seed, max_iter + 1)
        # metrics files are process-0-only: every host sharing out_dir
        # would interleave writes into the same metrics.jsonl
        self.metrics_logger = (
            MetricsLogger(out_dir) if jax.process_index() == 0
            else _NullMetricsLogger()
        )
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------- batching

    def _device_batch(self, raw: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        gt_key, mask_key = GT_KEYS[self.cfg.mode]
        gt = raw[gt_key]
        if gt.ndim == 3:  # (B, H, W) single channel -> repeat to 3
            gt = np.repeat(gt[..., None], 3, axis=-1)
        mask = raw[mask_key]
        if mask.ndim == 4:
            mask = mask[..., 0]
        batch = {
            "rgb_norm": jnp.asarray(raw["rgb_norm"], jnp.float32),
            "gt_norm": jnp.asarray(gt, jnp.float32),
            "valid_mask": jnp.asarray(mask.astype(bool)),
        }
        if "intrinsic" in raw:
            # camera K for metric3d losses (vnl); reference plumbs it at
            # genpercept_trainer.py:776-780
            batch["intrinsic"] = jnp.asarray(raw["intrinsic"], jnp.float32)
        if self.cfg.grad_accum_steps > 1:
            # loader yields (accum * micro, ...); the jitted step scans over
            # a leading accum axis
            a = self.cfg.grad_accum_steps
            batch = {
                k: v.reshape((a, v.shape[0] // a) + v.shape[1:])
                for k, v in batch.items()
            }
        if self.mesh is not None:
            from genpercept_tpu.parallel import put_global_batch

            axis = 1 if self.cfg.grad_accum_steps > 1 else 0
            # single-process: device_put; multi-host: assemble the global
            # array from this process's loader slice
            batch = put_global_batch(batch, self.mesh, axis)
        return batch

    # --------------------------------------------------------------- train

    def train(self, t_end: Optional[float] = None) -> None:
        logger.info("Training started")
        start = time.time()
        while self.effective_iter < self.max_iter:
            self.epoch += 1
            loader = (
                skip_first_batches(self.train_loader, self.n_batch_in_epoch)
                if self.n_batch_in_epoch > 0
                else iter(self.train_loader)
            )
            for raw in loader:
                batch = self._device_batch(raw)
                seed = self.seed_sequence[self.effective_iter]
                rng = jax.random.key((seed or 0) % (2**63))
                self.trainable, self.opt_state, metrics = self.step_fn(
                    self.trainable, self.frozen, self.opt_state, batch, rng
                )
                self.effective_iter += 1
                self.n_batch_in_epoch += 1

                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    raise RuntimeError(f"non-finite loss at iter {self.effective_iter}")
                self.metrics_logger.log_dict(
                    {k: float(v) for k, v in metrics.items()},
                    self.effective_iter, prefix="train/",
                )
                if self.effective_iter % 50 == 0:
                    logger.info(f"iter {self.effective_iter}: loss={loss:.4f}")

                self._periodic_callbacks()
                if self.effective_iter >= self.max_iter:
                    break
                if t_end is not None and time.time() > t_end:
                    logger.info("time budget reached; saving and exiting")
                    self.save_checkpoint("latest")
                    return
            self.n_batch_in_epoch = 0
        self.save_checkpoint("final")
        logger.info(f"Training finished in {time.time()-start:.0f}s")

    def _periodic_callbacks(self):
        if self.save_period and self.effective_iter % self.save_period == 0:
            self.save_checkpoint("latest")  # all processes (orbax collective)
        do_val = self.val_period and self.effective_iter % self.val_period == 0
        do_vis = self.vis_period and self.effective_iter % self.vis_period == 0
        if jax.process_count() > 1:
            # Reference behavior: validate/visualize on the MAIN process
            # regardless of world size (genpercept_trainer.py:1001-1063).
            # Params may be sharded across hosts (TP) or replicated (DP);
            # process_allgather materializes the full tree on every host,
            # then process 0 runs the standard single-device pipeline (all
            # arrays pinned to one local device, so no collectives — the
            # other processes do not participate in its programs) and
            # everyone syncs after.
            if do_val or do_vis:
                from jax.experimental import multihost_utils

                params = multihost_utils.process_allgather(
                    self.current_params())
                if jax.process_index() == 0:
                    dev = jax.local_devices()[0]
                    if do_val:
                        self.validate(params_override=params, device=dev)
                    if do_vis:
                        self.visualize(params_override=params, device=dev)
                multihost_utils.sync_global_devices(
                    f"genpercept_valvis_{self.effective_iter}")
            return
        if do_val:
            self.validate()
        if do_vis:
            self.visualize()

    def visualize(self, params_override: Optional[Dict] = None,
                  device=None) -> None:
        """Save colorized predictions on the vis split (reference
        genpercept_trainer.py:1065-1076)."""
        from PIL import Image

        from genpercept_tpu.ops.colorize import colorize_depth
        from genpercept_tpu.pipeline import PipelineConfig, build_single_infer

        params = (self.current_params() if params_override is None
                  else params_override)
        if device is not None:
            params = jax.device_put(params, device)
        pipe_cfg = PipelineConfig(mode=self.cfg.mode)
        infer = jax.jit(build_single_infer(self.models, pipe_cfg))
        vis_dir = osp.join(self.out_dir, "visualization",
                           f"iter_{self.effective_iter:06d}")
        os.makedirs(vis_dir, exist_ok=True)
        for name, loader in self.vis_loaders.items():
            for j, raw in enumerate(loader):
                rgb01 = (np.asarray(raw["rgb_norm"]) + 1.0) / 2.0
                x = jnp.asarray(rgb01, jnp.float32)
                pred = infer(params,
                             x if device is None else jax.device_put(x, device))
                if pred.ndim == 3:  # single-channel: colorize
                    img = np.asarray(
                        (colorize_depth(pred[0]) * 255).astype(jnp.uint8)
                    )
                else:
                    img = np.asarray((pred[0] * 255).astype(jnp.uint8))
                Image.fromarray(img).save(osp.join(vis_dir, f"{name}_{j:03d}.png"))
                if j >= 3:
                    break

    # ------------------------------------------------------------ validate

    def current_params(self) -> Dict:
        return merge_vae(self.trainable, self.frozen)

    def validate(self, params_override: Optional[Dict] = None,
                 device=None) -> Dict[str, Dict[str, float]]:
        """Run the real inference pipeline over each val split. Depth mode:
        least-squares-aligned depth metrics (reference :1078-1243); other
        modes: masked L1 against the normalized GT.

        params_override/device: multi-host path — a host-gathered param tree
        evaluated on ONE pinned local device (see _periodic_callbacks)."""
        from genpercept_tpu.pipeline import PipelineConfig, build_single_infer

        results = {}
        params = (self.current_params() if params_override is None
                  else params_override)
        if device is not None:
            params = jax.device_put(params, device)
        pipe_cfg = PipelineConfig(mode=self.cfg.mode)
        infer = jax.jit(build_single_infer(self.models, pipe_cfg))

        def put(x):
            return x if device is None else jax.device_put(x, device)

        gt_key, mask_key = GT_KEYS[self.cfg.mode]
        for name, loader in self.val_loaders.items():
            tracker = MetricTracker()
            for raw in loader:
                rgb01 = (np.asarray(raw["rgb_norm"]) + 1.0) / 2.0
                pred = np.asarray(
                    infer(params, put(jnp.asarray(rgb01, jnp.float32))))
                if self.cfg.mode != "depth":
                    gt01 = (np.asarray(raw[gt_key]) + 1.0) / 2.0
                    mask = np.asarray(raw[mask_key]).astype(bool)
                    if pred.ndim == 4 and gt01.ndim == 3:
                        gt01 = gt01[..., None]
                    diff = np.abs(pred - gt01)
                    if diff.ndim == 4:
                        diff = diff.mean(-1)
                    tracker.update(
                        "masked_l1",
                        float(diff[mask].mean()) if mask.any() else 0.0,
                    )
                    continue
                gt = np.asarray(raw["depth_raw_linear"])
                valid = np.asarray(raw["valid_mask_raw"]).astype(bool)
                for i in range(pred.shape[0]):
                    if not valid[i].any():
                        continue
                    aligned, _, _ = align_depth_least_square(
                        gt[i], pred[i], valid[i]
                    )
                    aligned = np.clip(aligned, 1e-6, None)
                    m = compute_metrics(
                        jnp.asarray(aligned)[None], jnp.asarray(gt[i])[None],
                        jnp.asarray(valid[i])[None],
                        names=["abs_relative_difference", "delta1_acc"],
                    )
                    for k, v in m.items():
                        tracker.update(k, float(v))
            results[name] = tracker.result()
            self.metrics_logger.log_dict(results[name], self.effective_iter,
                                         prefix=f"val/{name}/")
            logger.info("\n" + eval_dic_to_text(results[name], name, "val"))
        return results

    # ----------------------------------------------------------- checkpoint

    def save_checkpoint(self, name: str = "latest") -> str:
        from genpercept_tpu.io.checkpoints import save_train_checkpoint

        state = {
            "trainable": self.trainable,
            "opt_state": self.opt_state,
            "counters": {
                "effective_iter": jnp.asarray(self.effective_iter),
                "epoch": jnp.asarray(self.epoch),
                "n_batch_in_epoch": jnp.asarray(self.n_batch_in_epoch),
            },
        }
        path = save_train_checkpoint(osp.join(self.out_dir, "checkpoint"), state, name)
        logger.info(f"checkpoint saved: {path}")
        return path

    def load_checkpoint(self, name: str = "latest") -> None:
        from genpercept_tpu.io.checkpoints import load_train_checkpoint

        template = {
            "trainable": self.trainable,
            "opt_state": self.opt_state,
            "counters": {
                "effective_iter": jnp.asarray(self.effective_iter),
                "epoch": jnp.asarray(self.epoch),
                "n_batch_in_epoch": jnp.asarray(self.n_batch_in_epoch),
            },
        }
        state = load_train_checkpoint(osp.join(self.out_dir, "checkpoint"), name, template)
        self.trainable = state["trainable"]
        self.opt_state = state["opt_state"]
        c = state["counters"]
        self.effective_iter = int(c["effective_iter"])
        self.epoch = int(c["epoch"])
        self.n_batch_in_epoch = int(c["n_batch_in_epoch"])
        logger.info(f"resumed at iter {self.effective_iter}")
