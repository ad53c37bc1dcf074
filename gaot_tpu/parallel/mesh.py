"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's vestigial torch.distributed /
NCCL scaffolding (reference main.py:175-194, src/core/base_trainer.py:82-102
— which never actually syncs gradients; SURVEY.md §2.3). Here data
parallelism is real:

- a Mesh over ('data', 'model') axes,
- batches sharded on 'data' via NamedSharding, params replicated (or
  tensor-sharded on 'model' for the transformer), and
- `jax.jit` with sharded inputs — XLA inserts the gradient all-reduce over
  ICI automatically.

Multi-host setups call :func:`init_distributed` (jax.distributed over DCN)
before building the mesh.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import SetUpConfig


def init_distributed(setup: SetUpConfig) -> None:
    """Initialize jax.distributed for multi-host runs (DCN coordination)."""
    if not setup.distributed:
        return
    kwargs = {}
    if setup.coordinator_address:
        kwargs["coordinator_address"] = setup.coordinator_address
    if setup.num_processes is not None:
        kwargs["num_processes"] = setup.num_processes
    if setup.process_id is not None:
        kwargs["process_id"] = setup.process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(data_parallel: int = -1, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data_parallel=-1 uses all remaining
    devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide device count {n}")
    dp = n // model_parallel if data_parallel == -1 else data_parallel
    if dp * model_parallel != n:
        devices = devices[: dp * model_parallel]
    grid = np.asarray(devices).reshape(dp, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; all other axes replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_global(arr, mesh: Mesh, spec: P):
    """Place a host (or committed) array as a GLOBAL array with the given
    PartitionSpec over the mesh.

    Single-process: plain device_put (handles committed→sharded re-layout).
    Multi-process: every process must hold the same full host array;
    each process materializes only its addressable shards
    (jax.make_array_from_callback), so replicated split buffers work for
    multi-host data parallelism without any cross-host transfer.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_batch(batch: Dict[str, Any], mesh: Mesh, batch_size: int) -> Dict[str, Any]:
    """device_put a host batch dict: arrays with a leading batch axis are
    sharded over 'data', the rest replicated.

    One device_put call for the whole dict: on tunneled/remote devices each
    device_put pays a fixed round trip (~25-50 ms), so per-array placement of
    a 15-array graph batch costs ~10x more than a single pytree transfer.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)
    arrays = {k: np.asarray(v) for k, v in batch.items()}
    shardings = {
        k: data if (v.ndim >= 1 and v.shape[0] == batch_size) else rep
        for k, v in arrays.items()
    }
    return jax.device_put(arrays, shardings)


# ---------------------------------------------------------------------------
# Tensor parallelism for the transformer processor
# ---------------------------------------------------------------------------

# Param-path regexes → PartitionSpec over ('data', 'model'). Attention QKV and
# FFN up-projections shard their output features; O-proj and FFN down-
# projection shard input features (XLA all-reduces their outputs).
_TP_RULES = [
    (re.compile(r".*/attn/(q_proj|k_proj|v_proj)/kernel$"), P(None, "model")),
    (re.compile(r".*/attn/o_proj/kernel$"), P("model", None)),
    (re.compile(r".*/ffn/(w1|w3)/kernel$"), P(None, "model")),
    (re.compile(r".*/ffn/w2/kernel$"), P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/" + "/".join(parts)


def param_specs(params, model_parallel: bool = True):
    """PartitionSpec tree for the params: transformer matrices tensor-sharded
    over 'model' (if enabled and divisible), everything else replicated."""

    def spec_for(path, leaf):
        if model_parallel:
            s = _path_str(path)
            for pattern, spec in _TP_RULES:
                if pattern.match(s):
                    # Only shard if the dimension divides evenly.
                    axis = 1 if spec == P(None, "model") else 0
                    if leaf.ndim == 2:
                        return spec if axis < leaf.ndim else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, model_parallel: bool = True):
    """device_put params with TP specs over the mesh."""
    specs = param_specs(params, model_parallel=model_parallel and
                        mesh.shape.get("model", 1) > 1)

    def place(leaf, spec):
        if spec != P():
            axis = list(spec).index("model")
            if leaf.shape[axis] % mesh.shape["model"]:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)))
