from e3diff_tpu.geometry.nerf import (
    place_dihedral,
    nerf_build_backbone,
    nerf_build_backbone_np,
    NERF_DEFAULTS,
)
from e3diff_tpu.geometry.pdb import write_backbone_pdb
from e3diff_tpu.geometry.chain import (
    create_chain_from_angles,
    write_pdb_folder,
    angle_error_rate,
)

__all__ = [
    "place_dihedral",
    "nerf_build_backbone",
    "nerf_build_backbone_np",
    "NERF_DEFAULTS",
    "write_backbone_pdb",
    "create_chain_from_angles",
    "write_pdb_folder",
    "angle_error_rate",
]
