from .scaling import rescale, CoordinateScaler, MinMaxScaler, StandardScaler
from .metrics import compute_batch_errors, compute_final_metric

__all__ = [
    "rescale",
    "CoordinateScaler",
    "MinMaxScaler",
    "StandardScaler",
    "compute_batch_errors",
    "compute_final_metric",
]
