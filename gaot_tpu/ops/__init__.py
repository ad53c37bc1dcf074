from .neighbor_search import radius_search, knn_search, NeighborSearch
from .padding import PaddedGraph, pad_csr, stack_graphs, repad
from .segment_ops import (
    gather_neighbors,
    masked_sum,
    masked_mean,
    masked_max,
    masked_softmax,
)
from .edge_drop import apply_edge_drop_mask

__all__ = [
    "radius_search",
    "knn_search",
    "NeighborSearch",
    "PaddedGraph",
    "pad_csr",
    "stack_graphs",
    "repad",
    "gather_neighbors",
    "masked_sum",
    "masked_mean",
    "masked_max",
    "masked_softmax",
    "apply_edge_drop_mask",
]
