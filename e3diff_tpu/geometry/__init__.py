from e3diff_tpu.geometry.nerf import (
    place_dihedral,
    nerf_build_backbone,
    nerf_build_backbone_np,
    NERF_DEFAULTS,
)
from e3diff_tpu.geometry.pdb import backbone_pdb_text, write_backbone_pdb
from e3diff_tpu.geometry.chain import (
    backbone_coords_from_angles,
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
    "backbone_pdb_text",
    "backbone_coords_from_angles",
    "create_chain_from_angles",
    "write_pdb_folder",
    "angle_error_rate",
]
