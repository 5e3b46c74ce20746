from e3diff_tpu.sampling.structure import sample_structure_batches
from e3diff_tpu.sampling.sequence import sample_sequence_batches
from e3diff_tpu.sampling.pipeline import run_pipeline

__all__ = [
    "sample_structure_batches",
    "sample_sequence_batches",
    "run_pipeline",
]
