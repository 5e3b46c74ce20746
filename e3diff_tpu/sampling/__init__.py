from e3diff_tpu.sampling.structure import (
    make_structure_sampler,
    sample_structure_batches,
)
from e3diff_tpu.sampling.sequence import (
    make_sequence_sampler,
    sample_sequence_batches,
)
from e3diff_tpu.sampling.pipeline import run_pipeline

__all__ = [
    "make_structure_sampler",
    "sample_structure_batches",
    "make_sequence_sampler",
    "sample_sequence_batches",
    "run_pipeline",
]
