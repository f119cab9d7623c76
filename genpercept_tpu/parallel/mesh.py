"""Device mesh + sharding layout for GenPercept on TPU.

This module replaces the reference's entire distributed stack (HF Accelerate
DDP over NCCL, `accelerate_train.py:52-56,186-196`): a `jax.sharding.Mesh`
with named axes

  data  — batch (data parallel; gradient all-reduce compiled by XLA onto ICI)
  model — tensor parallel: attention heads / FF inner dim / conv output
          channels sharded; activations all-gathered where XLA decides

and `NamedSharding` annotations. No hand-written collectives: XLA inserts
all-reduce / all-gather / reduce-scatter from the shardings.

The model (~1.3B params incl. VAE+CLIP) fits on one v5e chip, so the default
production layout is pure DP (mesh = {"data": N}); the TP axis exists for
memory headroom at large batch/resolution and is exercised by the multichip
dry-run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model <= n, f"{data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Batch-axis sharding for activations/inputs. batch_axis=1 for
    grad-accum batches shaped (accum, micro_batch, ...)."""
    spec = (None,) * batch_axis + ("data",)
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(batch: Dict[str, Any], mesh: Mesh,
                     batch_axis: int = 0) -> Dict[str, Any]:
    """Place a host batch onto the mesh with the batch axis sharded over
    'data'.

    Single-process: a plain device_put. Multi-host (jax.distributed
    initialized, mesh spanning processes over DCN): each process passes its
    LOCAL slice of the global batch (see data/sampler.py
    shard_batch_indices) and the global array is assembled with
    jax.make_array_from_process_local_data — the TPU-native replacement for
    Accelerate's per-rank DataLoader + DDP input scatter
    (accelerate_train.py:186-196)."""
    sh = batch_sharding(mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)

    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        gshape = list(x.shape)
        gshape[batch_axis] = x.shape[batch_axis] * nproc
        return jax.make_array_from_process_local_data(sh, x, tuple(gshape))

    return {k: put(v) for k, v in batch.items()}


# --------------------------------------------------------------- TP layout

def _tp_spec_for(path: str, ndim: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter.

    Layout (Megatron-style column/row split per attention/FF pair):
      to_q/to_k/to_v weight (in, out):  shard out  (heads split)
      to_out.0 weight       (in, out):  shard in   (row-parallel)
      ff net.0 proj         (in, out):  shard out  (inner dim split)
      ff net.2              (in, out):  shard in
      conv kernels (H, W, I, O): replicated (conv channel splits don't pay
        off at SD2.1 sizes — GroupNorm(32) would force per-group gathers)
      biases on column-split layers: shard out; row-split: replicated
    """
    shard_out = ("to_q", "to_k", "to_v", "net.0.proj", "q_proj", "k_proj", "v_proj", "fc1")
    shard_in = ("to_out.0", "net.2", "out_proj", "fc2")
    if ndim == 2:
        if any(f".{m}.weight".replace("..", ".") in path or path.endswith(f"{m}.weight") for m in shard_out):
            return P(None, "model")
        if any(path.endswith(f"{m}.weight") for m in shard_in):
            return P("model", None)
    if ndim == 1:
        if any(path.endswith(f"{m}.bias") for m in shard_out):
            return P("model")
    return P()


def shard_opt_state_zero1(opt_state, mesh: Mesh) -> Any:
    """ZeRO-1-style optimizer-state sharding: slice each optimizer moment's
    largest divisible axis across the 'data' mesh axis (the reference's
    optional DeepSpeed hook, accelerate_train.py:198-202 — here it's just a
    sharding annotation; XLA inserts the reduce-scatter/all-gather)."""
    n_data = mesh.shape["data"]

    def place(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        for dim, size in enumerate(leaf.shape):
            if size % n_data == 0 and size >= n_data:
                spec = [None] * leaf.ndim
                spec[dim] = "data"
                return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, opt_state)


def shard_params_tp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param pytree on the mesh with the TP layout above.

    With mesh model=1 this is pure replication (the DP layout)."""

    def place(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path).replace("/", ".")
        spec = _tp_spec_for(name, leaf.ndim)
        # drop specs that don't divide evenly (e.g. tiny test models)
        axis = mesh.shape.get("model", 1)
        for dim, s in enumerate(spec):
            if s == "model" and leaf.shape[dim] % axis != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
