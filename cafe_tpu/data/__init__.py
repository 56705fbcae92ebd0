from .datasets import (
    CTRArrays,
    DATASET_SPECS,
    load_dataset,
    batch_iterator,
    num_batches,
)
from .synthetic import make_synthetic_arrays, write_synthetic_dataset

__all__ = [
    "CTRArrays",
    "DATASET_SPECS",
    "load_dataset",
    "batch_iterator",
    "num_batches",
    "make_synthetic_arrays",
    "write_synthetic_dataset",
]
