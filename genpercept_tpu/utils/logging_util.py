"""Logging utilities: file+console logging, metrics logger, eval tabulation.

Rebuild of `src/util/logging_util.py`: `config_logging` (file + console
handlers), a training-metrics logger (JSONL always; tensorboard when
available), and `eval_dic_to_text`.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def config_logging(cfg_logging=None, out_dir: Optional[str] = None) -> None:
    level = logging.INFO
    if cfg_logging is not None:
        level = getattr(logging, str(cfg_logging.get("level", "INFO")).upper(), logging.INFO)
    fmt = "%(asctime)s - %(levelname)s - %(name)s - %(message)s"
    handlers = [logging.StreamHandler()]
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(out_dir, "logging.log")))
    logging.basicConfig(level=level, format=fmt, handlers=handlers, force=True)


class MetricsLogger:
    """Scalar logger: JSONL file always, tensorboard when importable
    (replaces the reference's tb_logger singleton, logging_util.py:42-64)."""

    def __init__(self, out_dir: str, enable_tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tensorboard"))
            except Exception:
                self._tb = None

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(
            json.dumps({"t": time.time(), "step": step, tag: float(value)}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def log_dict(self, scalars: Dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in scalars.items():
            self.log_scalar(f"{prefix}{k}", v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


# -------------- wandb tools (logging_util.py:68-93) --------------
#
# The reference force-disables wandb in accelerate_train.py:139-140, but
# ships these helpers for runs that re-enable it; same here. wandb is not a
# dependency of this package — every helper degrades to a no-op (returning
# None) when it isn't importable, so JSONL+tensorboard remain the default
# observability path.


def init_wandb(enable: bool, **kwargs):
    """Start a wandb run (reference init_wandb: sync_tensorboard so the
    MetricsLogger's TB scalars mirror into wandb). Returns the run object,
    or None when disabled / wandb not installed."""
    try:
        import wandb
    except ImportError:
        if enable:
            logging.warning("wandb requested but not installed; disabled")
        return None
    if enable:
        return wandb.init(sync_tensorboard=True, **kwargs)
    return wandb.init(mode="disabled")


def save_wandb_job_id(run, out_dir: str) -> None:
    """Persist the run id so --resume_run reattaches to the same wandb run
    (reference save_wandb_job_id)."""
    if run is None:
        return
    with open(os.path.join(out_dir, "WANDB_ID"), "w") as f:
        f.write(run.id)


def load_wandb_job_id(out_dir: str) -> Optional[str]:
    """Read back the persisted run id (reference load_wandb_job_id);
    None when no WANDB_ID file exists."""
    path = os.path.join(out_dir, "WANDB_ID")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return f.read().strip()


def log_slurm_job_id(metrics: "MetricsLogger", step: int) -> None:
    """Record the SLURM job id as a scalar (-1 outside SLURM), reference
    log_slurm_job_id — lets a resumed run's metric stream show which job
    produced which steps."""
    jobid = int(os.getenv("SLURM_JOB_ID", -1))
    metrics.log_scalar("job_id", jobid, step)
    logging.debug("Slurm job_id: %s", jobid)


def eval_dic_to_text(val_metrics: Dict[str, float], dataset_name: str,
                     sample_list_path: str, diff: Optional[str] = None) -> str:
    """Tabulated eval summary (logging_util.py:96-102)."""
    header = f"Eval metrics: dataset {dataset_name}, split {sample_list_path}"
    if diff:
        header += f", diff {diff}"
    keys = list(val_metrics)
    widths = [max(len(k), 10) for k in keys]
    row1 = " | ".join(k.ljust(w) for k, w in zip(keys, widths))
    row2 = " | ".join(f"{val_metrics[k]:.6f}".ljust(w) for k, w in zip(keys, widths))
    return "\n".join([header, row1, row2])
