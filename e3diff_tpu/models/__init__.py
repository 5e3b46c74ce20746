from e3diff_tpu.models.config import (
    TransformerConfig,
    structure_model_configs,
    sequence_model_configs,
)
from e3diff_tpu.models.structure import StructureDenoiser
from e3diff_tpu.models.sequence import SequenceDenoiser

__all__ = [
    "TransformerConfig",
    "structure_model_configs",
    "sequence_model_configs",
    "StructureDenoiser",
    "SequenceDenoiser",
]
