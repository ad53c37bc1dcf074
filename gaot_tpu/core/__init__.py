from .config import (
    SetUpConfig,
    ModelArgsConfig,
    ModelConfig,
    DatasetConfig,
    OptimizerConfig,
    OptimizerArgsConfig,
    PathConfig,
    GAOTConfig,
    MAGNOConfig,
    TransformerConfig,
    AttentionConfig,
    merge_config,
    load_config_file,
)
from .metadata import Metadata, DATASET_METADATA

__all__ = [
    "SetUpConfig",
    "ModelArgsConfig",
    "ModelConfig",
    "DatasetConfig",
    "OptimizerConfig",
    "OptimizerArgsConfig",
    "PathConfig",
    "GAOTConfig",
    "MAGNOConfig",
    "TransformerConfig",
    "AttentionConfig",
    "merge_config",
    "load_config_file",
    "Metadata",
    "DATASET_METADATA",
]
