"""Sampled-angles -> PDB chain driver.

Rebuild of create_new_chain_nerf / write_preds_pdb_folder
(structure_model/create_pdb.py:326-421): infers which columns are bond
angles vs dihedrals by name, maps the dataset's (misnamed, quirk Q1)
feature columns onto NERF parameters, guards NaNs, and writes one PDB per
sample.

Column semantics (COLS, create_pdb.py:38): ["phi","psi","omega",
"dihedral_o","tau","CA:C:1N","1C:N:CA","CA:C:O"] — tau -> CA-C bond angle,
CA:C:1N -> C-N, 1C:N:CA -> N-CA, CA:C:O -> C-O. The names do not match the
physical angles stored by preprocessing (Q1), but the whole pipeline is
self-consistent under these labels; replicated as-is.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from e3diff_tpu.data.dataset import FEATURE_NAMES
from e3diff_tpu.geometry.nerf import nerf_build_backbone_np
from e3diff_tpu.geometry.pdb import write_backbone_pdb
from e3diff_tpu.ops.angles import wrap_angle

REQUIRED_DIHEDRALS = ["phi", "psi", "omega", "dihedral_o"]
_ANGLE_TO_KWARG = {
    "tau": "bond_angle_ca_c",
    "N:CA:C": "bond_angle_ca_c",
    "CA:C:1N": "bond_angle_c_n",
    "1C:N:CA": "bond_angle_n_ca",
    "CA:C:O": "bond_angle_c_o",
}
_DIST_TO_KWARG = {
    "0C:1N": "bond_len_c_n",
    "N:CA": "bond_len_n_ca",
    "CA:C": "bond_len_ca_c",
}


def _columns(angles, names):
    angles = np.asarray(angles)
    return {n: angles[:, i] for i, n in enumerate(names)}


def backbone_coords_from_angles(
    angles: np.ndarray,
    feature_names: Sequence[str] = tuple(FEATURE_NAMES),
    center_coords: bool = True,
) -> np.ndarray | None:
    """angles: (n_res, n_feat) sampled values -> (4*n_res, 3) N/CA/C/O
    coords via NERF under the Q1 column mapping, or None when the rebuilt
    coordinates contain NaN (reference NaN guard, create_pdb.py:393-395)."""
    angles = np.asarray(angles)
    cols = _columns(angles, feature_names)
    # distances have exactly one ':' in the name; angles otherwise
    dists = {n: v for n, v in cols.items() if n.count(":") == 1}
    angles_named = {n: v for n, v in cols.items() if n.count(":") != 1}
    assert all(d in angles_named for d in REQUIRED_DIHEDRALS), (
        f"missing dihedrals in {list(cols)}")

    kwargs = {
        "phi": angles_named["phi"],
        "psi": angles_named["psi"],
        "omega": angles_named["omega"],
        "dihedral_o": angles_named["dihedral_o"],
    }
    for name, val in angles_named.items():
        if name in REQUIRED_DIHEDRALS:
            continue
        kwargs[_ANGLE_TO_KWARG[name]] = val
    for name, val in dists.items():
        kwargs[_DIST_TO_KWARG[name]] = val

    coords = nerf_build_backbone_np(center=center_coords, **kwargs)
    if np.any(np.isnan(coords)):
        return None
    assert coords.shape == (angles.shape[0] * 4, 3)
    return coords


def create_chain_from_angles(
    angles: np.ndarray,
    out_fname: str,
    feature_names: Sequence[str] = tuple(FEATURE_NAMES),
    center_coords: bool = True,
) -> str:
    """angles: (n_res, n_feat) sampled values. Returns the written path, or
    "" when coordinates contain NaN (reference NaN guard,
    create_pdb.py:393-395)."""
    coords = backbone_coords_from_angles(angles, feature_names,
                                         center_coords)
    if coords is None:
        return ""
    return write_backbone_pdb(coords, out_fname)


def write_pdb_folder(
    sampled: Sequence[np.ndarray],
    outdir: str,
    basename_prefix: str = "generated_",
    feature_names: Sequence[str] = tuple(FEATURE_NAMES),
) -> list[str]:
    """Write one PDB per sampled angle matrix
    (write_preds_pdb_folder, create_pdb.py:403-421)."""
    os.makedirs(outdir, exist_ok=True)
    written = []
    for i, sample in enumerate(sampled):
        written.append(create_chain_from_angles(
            np.asarray(sample),
            os.path.join(outdir, f"{basename_prefix}{i}.pdb"),
            feature_names=feature_names))
    return written


def angle_error_rate(true_angles: np.ndarray, generated: np.ndarray) -> np.ndarray:
    """Mean wrapped-angle error per feature, as a fraction of a full turn —
    the reference's quality recipe (create_pdb.py:450-453 comment):
    abs(wrap(d).mean(axis=0) / pi * 180) / 360."""
    d = np.asarray(true_angles) - np.asarray(generated)
    wrapped = np.asarray(wrap_angle(d))
    return np.abs(wrapped.mean(axis=0) / np.pi * 180) / 360
