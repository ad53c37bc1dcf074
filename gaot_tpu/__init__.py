"""gaot_tpu — a TPU-native JAX/Flax/Pallas framework for Geometry-Aware Operator
Transformers (GAOT).

A from-scratch re-design of the capabilities of camlab-ethz/GAOT (a PyTorch/CUDA
neural PDE surrogate for arbitrary unstructured-mesh domains) built TPU-first:

- host-side graph construction emitting padded, static-shape neighbor arrays
  (replacing torch_cluster/open3d CUDA radius search; see
  reference src/model/layers/utils/neighbor_search.py),
- masked segment reductions over a fixed K axis (replacing torch_scatter
  segment_csr; see reference src/model/layers/utils/segment_csr.py),
- a vmap-able MAGNO encoder/decoder + UViT transformer processor compiled by
  XLA onto the MXU, with optional Pallas kernels for the hot ops,
- data parallelism via jax.sharding over a device mesh (replacing the
  reference's vestigial torch.distributed/NCCL scaffolding).

Layer map mirrors the reference (see SURVEY.md §1): core configs/metadata,
ops primitives, model layers, data pipeline, trainers, utilities, parallelism.
"""

__version__ = "0.1.0"

from . import core, ops, models, data, train, utils, parallel  # noqa: F401
