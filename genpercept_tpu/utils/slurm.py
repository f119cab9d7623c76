"""Slurm helpers (reference src/util/slurm_util.py:7-15)."""

import os


def is_on_slurm() -> bool:
    return os.environ.get("SLURM_JOB_ID") is not None


def get_local_scratch_dir():
    return os.environ.get("SLURM_TMPDIR") or os.environ.get("TMPDIR")
