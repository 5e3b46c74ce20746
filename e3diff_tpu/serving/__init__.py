"""Production serving: batched peptide-design inference.

Beyond the reference (which only ships offline sampling scripts —
structure_model/sample.py, sequence_model/sample_by_generated_angles.py):
a deployable engine + micro-batching request queue + HTTP front-end that
run the full design pipeline (pocket -> backbone angles -> NERF PDB ->
inverse-folded sequence) on fixed TPU-friendly shapes with the DDIM fast
path as the default sampler.
"""

from e3diff_tpu.serving.batcher import MicroBatcher
from e3diff_tpu.serving.engine import DesignEngine, pocket_record
from e3diff_tpu.serving.server import DesignServer

__all__ = ["DesignEngine", "DesignServer", "MicroBatcher", "pocket_record"]
