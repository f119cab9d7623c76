"""LoRA adapters for the UNet attention projections.

Rebuild of the reference's PEFT LoRA path (genpercept_trainer.py:223-233):
rank-r adapters on every to_q / to_k / to_v / to_out.0 linear in the UNet,
alpha == rank, gaussian init on A (std 1/r), zero init on B, so the adapter
starts as identity. Represented as a separate pytree mirroring the UNet
structure — the base stays frozen, only LoRA params are trainable; XLA fuses
the (x @ A) @ B bypass into the surrounding matmuls.

`merge_lora` folds adapters into base weights for inference / export
(published LoRA-merged checkpoints load through the plain importer).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

TARGET_LEAVES = ("to_q", "to_k", "to_v")
TARGET_OUT = "to_out"


def _is_target(path: Tuple[str, ...]) -> bool:
    if not path or path[-1] != "weight":
        return False
    mods = path[:-1]
    if mods and mods[-1] in TARGET_LEAVES:
        return True
    # to_out.0.weight
    return len(mods) >= 2 and mods[-2] == TARGET_OUT and mods[-1] == "0"


def init_lora(key, unet_params: Dict[str, Any], rank: int) -> Dict[str, Any]:
    """Create {path: {lora_A (din, r), lora_B (r, dout)}} nested like the
    UNet tree, for every attention projection weight."""

    def walk(node, path, key):
        out = {}
        for name, child in node.items():
            sub_path = path + (name,)
            if isinstance(child, dict):
                key, sub = jax.random.fold_in(key, hash(name) % 2**31), child
                got = walk(child, sub_path, key)
                if got:
                    out[name] = got
            elif _is_target(sub_path):
                din, dout = child.shape
                akey = jax.random.fold_in(key, 7)
                out[name] = {
                    "lora_A": jax.random.normal(akey, (din, rank), child.dtype)
                    * (1.0 / rank),
                    "lora_B": jnp.zeros((rank, dout), child.dtype),
                }
        return out

    return walk(unet_params, (), key)


def apply_lora(base: Dict[str, Any], lora: Dict[str, Any], scale: float = 1.0) -> Dict[str, Any]:
    """Return params with W' = W + scale * A @ B for every adapted weight.
    (alpha == rank in the reference config makes the PEFT scaling factor 1.)
    """

    def walk(b, l):
        out = {}
        for name, child in b.items():
            la = l.get(name)
            if la is None:
                out[name] = child
            elif isinstance(child, dict):
                out[name] = walk(child, la)
            else:  # leaf weight; la == {"lora_A": ..., "lora_B": ...}
                delta = la["lora_A"] @ la["lora_B"]
                out[name] = child + scale * delta.astype(child.dtype)
        return out

    return walk(base, lora)


def merge_lora(base: Dict[str, Any], lora: Dict[str, Any], scale: float = 1.0) -> Dict[str, Any]:
    """Alias of apply_lora with concrete arrays (for export)."""
    return apply_lora(base, lora, scale)


def count_lora_params(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
