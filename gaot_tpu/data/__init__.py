from .readers import read_dataset
from .data_processor import DataProcessor, POSEIDON_DATASETS
from .sequential import (
    SequentialDataProcessor,
    DynamicPairBatcher,
    RolloutTestBatcher,
    compute_sequential_stats,
    generate_time_pairs,
    make_sequential_loader,
)
from .graph_builder import GraphBuilder, VxSplitGraphs
from .loader import BatchLoader, make_static_fx_loader, make_static_vx_loader

__all__ = [
    "read_dataset",
    "DataProcessor",
    "POSEIDON_DATASETS",
    "SequentialDataProcessor",
    "DynamicPairBatcher",
    "RolloutTestBatcher",
    "compute_sequential_stats",
    "generate_time_pairs",
    "make_sequential_loader",
    "GraphBuilder",
    "VxSplitGraphs",
    "BatchLoader",
    "make_static_fx_loader",
    "make_static_vx_loader",
]
