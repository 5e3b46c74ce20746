from e3diff_tpu.data.dataset import (
    AA_VOCAB,
    SS_VOCAB,
    FEATURE_NAMES,
    LigandBindingSiteData,
    load_complexes,
    pocket_extend_mask,
    split_complexes,
)
from e3diff_tpu.data.prefetch import prefetch_to_device
from e3diff_tpu.data.synthetic import synthetic_complexes

__all__ = [
    "AA_VOCAB",
    "SS_VOCAB",
    "FEATURE_NAMES",
    "LigandBindingSiteData",
    "load_complexes",
    "pocket_extend_mask",
    "prefetch_to_device",
    "split_complexes",
    "synthetic_complexes",
]
