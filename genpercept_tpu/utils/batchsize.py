"""Inference batch-size oracle for TPU.

TPU analogue of the reference's empirically-measured VRAM lookup table
(`genpercept/util/batchsize.py:26-81`): static per-(resolution, dtype)
maximum batch sizes for a 16 GB v5e chip, measured with the one-step depth
pipeline (UNet + VAE encoder/decoder resident, flash attention on).
"""

from __future__ import annotations

import bisect

# {dtype: {max_resolution_long_side: max_batch}} — v5e (16 GB HBM)
_V5E_TABLE = {
    "bfloat16": {512: 32, 768: 16, 1024: 8, 1536: 2},
    "float32": {512: 12, 768: 6, 1024: 2, 1536: 1},
}


def find_batch_size(ensemble_size: int, input_res: int, dtype: str = "bfloat16") -> int:
    """Largest safe per-call batch for the one-step pipeline on one chip."""
    table = _V5E_TABLE.get(str(dtype).replace("jnp.", ""), _V5E_TABLE["float32"])
    keys = sorted(table)
    idx = bisect.bisect_left(keys, input_res)
    if idx >= len(keys):
        return 1
    bs = table[keys[idx]]
    return max(min(bs, ensemble_size) if ensemble_size > 1 else bs, 1)
