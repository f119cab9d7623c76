"""safetensors (PyTorch layout) -> JAX param-pytree importer.

The published GenPercept / SD2.1 checkpoints are torch safetensors
(`unet/diffusion_pytorch_model.safetensors`, `dpt_head/model.safetensors`,
`vae/...`, `text_encoder/...` — layout sniffed by reference run.py:283-357).
Because our param trees mirror the torch module paths key-for-key, import is
a pure layout transform:

  conv weights   OIHW -> HWIO     (ndim == 4)
  linear weights (out,in) -> (in,out)  (ndim == 2, except embeddings)
  norms / biases unchanged        (ndim <= 1)

Keys dropped: position_ids buffers, num_batches_tracked, and (for custom-head
UNets) conv_out/conv_norm_out, which the reference deletes
(run.py:316-341, accelerate_train.py:421-424).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Mapping

import jax.numpy as jnp
import numpy as np

_DROP_PATTERNS = (
    re.compile(r"position_ids$"),
    re.compile(r"num_batches_tracked$"),
)

# 2-D tensors that are lookup tables, not matmul weights: keep (rows, cols)
_EMBEDDING_PATTERNS = (
    re.compile(r"embedding\.weight$"),
    re.compile(r"embeddings\.weight$"),
)


def _should_drop(key: str) -> bool:
    return any(p.search(key) for p in _DROP_PATTERNS)


def _is_embedding(key: str) -> bool:
    return any(p.search(key) for p in _EMBEDDING_PATTERNS)


def convert_tensor(key: str, value: np.ndarray) -> np.ndarray:
    if value.ndim == 4:
        return np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
    if value.ndim == 2 and key.endswith("weight") and not _is_embedding(key):
        return np.transpose(value, (1, 0))  # (out,in) -> (in,out)
    return value


def unflatten_dict(flat: Mapping[str, Any], sep: str = ".") -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def convert_torch_state_dict(
    state: Mapping[str, np.ndarray],
    strip_prefix: str = "",
    drop_keys: Iterable[str] = (),
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Flat torch state dict (numpy values) -> nested JAX param tree."""
    drop = set(drop_keys)
    flat: Dict[str, Any] = {}
    for key, value in state.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        if _should_drop(key) or any(key.startswith(d) for d in drop):
            continue
        flat[key] = jnp.asarray(convert_tensor(key, np.asarray(value)), dtype=dtype)
    return unflatten_dict(flat)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a safetensors file into a flat dict of numpy arrays."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def torch_module_to_pytree(module, strip_prefix: str = "", drop_keys=()) -> Dict[str, Any]:
    """Convenience for tests: torch nn.Module -> param tree."""
    state = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
    return convert_torch_state_dict(state, strip_prefix, drop_keys)


def flatten_dict(tree: Mapping[str, Any], sep: str = ".", prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else k
        if isinstance(v, Mapping):
            flat.update(flatten_dict(v, sep, key))
        else:
            flat[key] = v
    return flat


def to_torch_state_dict(params: Mapping[str, Any], add_prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: JAX param tree -> torch-layout
    flat state dict (HWIO -> OIHW, (in,out) -> (out,in)). Used to export
    checkpoints loadable by the reference/diffusers, and in tests."""
    out: Dict[str, np.ndarray] = {}
    for key, value in flatten_dict(params).items():
        arr = np.asarray(value)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        elif arr.ndim == 2 and key.endswith("weight") and not _is_embedding(key):
            arr = np.transpose(arr, (1, 0))
        out[add_prefix + key] = arr
    return out


def save_safetensors(state: Mapping[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)
