from ggad_tpu.datasets.core import GADDataset
from ggad_tpu.datasets.splits import reference_split, SplitResult
from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.datasets.loaders import (
    load_mat,
    load_dgraphfin,
    load_dgraphfin_dataset,
    load_dataset,
)
from ggad_tpu.datasets.registry import DATASET_PRESETS, preset_for

__all__ = [
    "GADDataset",
    "reference_split",
    "SplitResult",
    "synthetic_gad",
    "load_mat",
    "load_dgraphfin",
    "load_dgraphfin_dataset",
    "load_dataset",
    "DATASET_PRESETS",
    "preset_for",
]
