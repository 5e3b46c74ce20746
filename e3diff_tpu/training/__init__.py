from e3diff_tpu.training.optim import (
    make_optimizer,
    linear_warmup_per_epoch,
)
from e3diff_tpu.training.structure import (
    StructureTrainer,
    structure_loss_terms,
)
from e3diff_tpu.training.sequence import (
    SequenceTrainer,
    sequence_losses,
)

__all__ = [
    "make_optimizer",
    "linear_warmup_per_epoch",
    "StructureTrainer",
    "structure_loss_terms",
    "SequenceTrainer",
    "sequence_losses",
]
