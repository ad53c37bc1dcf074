"""Spatial (sequence) sharding for GAOT-3D-scale workloads.

The reference has no sequence/context parallelism (SURVEY.md §2.3) — its
largest claimed workloads (GAOT-3D, DrivaerNet++-class industrial CFD:
millions of surface points, 64³+ latent grids) are handled in a separate
optimized repo. Here it is a first-class mesh axis: with
``setup.spatial_parallel`` on, the *query* axis — latent tokens through the
processor, output query points in the decoder — is sharded over the mesh's
'model' axis via ``with_sharding_constraint``. The XLA SPMD partitioner then

- partitions every AGNO gather / kernel-MLP / masked reduce over the sharded
  query rows (node features stay replicated; gathers with sharded index rows
  need no communication),
- all-gathers K/V for processor attention (tokens stay sharded for QKV
  projections, FFN, and norms — where the activation memory lives), and
- keeps the per-chip activation footprint at 1/mp of the full grid,

which is what lets a 64³ latent grid (262k tokens) train at all: its fp32
activation stream alone exceeds a single chip's HBM.

Usage: the trainer (or test) sets the mesh globally with ``jax.set_mesh`` and
enables the hint context; model code calls :func:`shard_queries` at the
sharding seams, which is a no-op unless enabled.
"""
from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import PartitionSpec as P

# Process-global default (trainer entry point) with a thread-local override
# (the context manager). The global must NOT be thread-local: tracing can
# happen on a different thread than the one that configured the trainer.
_global_enabled = False
_state = threading.local()


def spatial_enabled() -> bool:
    override = getattr(_state, "override", None)
    return _global_enabled if override is None else override


@contextlib.contextmanager
def spatial_sharding(enabled: bool = True):
    """Enable spatial-sharding hints inside this context (trace-time,
    this thread only)."""
    prev = getattr(_state, "override", None)
    _state.override = enabled
    try:
        yield
    finally:
        _state.override = prev


def enable_spatial_sharding(enabled: bool = True) -> None:
    """Process-global switch (trainer entry point; tests use the context)."""
    global _global_enabled
    _global_enabled = enabled


def set_ambient_mesh(mesh) -> None:
    """Install ``mesh`` as jax's ambient mesh, or reset to an inert empty
    mesh when ``mesh`` is None — so a spatial trainer's mesh never leaks
    into later trainers/jits in the same process."""
    import numpy as np

    if mesh is None:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[0]), ())  # 0-d: no named axes
    jax.set_mesh(mesh)


def shard_queries(x: jax.Array, axis: int = -2) -> jax.Array:
    """Hint XLA to shard the query/token axis of ``x`` over 'model'.

    x: [..., Q, C] activations ([B, Q, C] batched or [Q, C] unbatched).
    No-op unless inside :func:`spatial_sharding` (or the global switch) —
    model code can call this unconditionally.
    """
    if not spatial_enabled():
        return x
    axis = axis % x.ndim
    spec = [None] * x.ndim
    spec[axis] = "model"
    if x.ndim >= 3:
        spec[0] = "data"
    return jax.lax.with_sharding_constraint(x, P(*spec))
