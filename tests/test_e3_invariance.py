"""E(3)-invariance: the models' inputs (internal angles) are invariant to
rigid motions of the input coordinates, and NERF reconstruction recovers
geometry up to a rigid motion.

This is the framework's core representational claim (the repo name's
"E3-invariant"): no coordinates ever reach the networks."""

import numpy as np

from e3diff_tpu.data.preprocessing import extract_angle_dihedrals
from e3diff_tpu.geometry import nerf_build_backbone_np


def _random_rotation(rng):
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _chain(n, rng):
    base = np.cumsum(rng.normal(1.5, 0.2, (n, 3)), axis=0)
    return [{"N": b + rng.normal(0, 0.1, 3),
             "CA": b + [1.2, 0, 0] + rng.normal(0, 0.1, 3),
             "C": b + [2.2, 0.8, 0] + rng.normal(0, 0.1, 3),
             "O": b + [2.6, 1.9, 0.3] + rng.normal(0, 0.1, 3)}
            for b in base]


def test_angles_invariant_to_rigid_motion():
    rng = np.random.default_rng(0)
    coords = _chain(8, rng)
    rot = _random_rotation(rng)
    shift = rng.normal(size=3) * 10

    moved = [{k: rot @ v + shift for k, v in r.items()} for r in coords]

    a1 = extract_angle_dihedrals(coords)
    a2 = extract_angle_dihedrals(moved)
    for r1, r2 in zip(a1, a2):
        for k in r1:
            np.testing.assert_allclose(r1[k], r2[k], atol=1e-7,
                                       err_msg=f"angle {k} not invariant")


def test_angles_dihedral_sign_flips_under_reflection():
    """Proper invariance is E(3)+ (SE(3)); mirror reflection flips dihedral
    signs while planar angles stay — the representation distinguishes
    chirality, as it must for proteins."""
    rng = np.random.default_rng(1)
    coords = _chain(8, rng)
    mirrored = [{k: v * np.array([-1.0, 1.0, 1.0]) for k, v in r.items()}
                for r in coords]
    a1 = extract_angle_dihedrals(coords)
    a2 = extract_angle_dihedrals(mirrored)
    for r1, r2 in zip(a1, a2):
        np.testing.assert_allclose(r1["phi"], -r2["phi"], atol=1e-7)
        np.testing.assert_allclose(r1["theta1"], r2["theta1"], atol=1e-7)


def test_nerf_roundtrip_angles():
    """angles -> NERF coords -> re-extracted angles == original (for the
    angles NERF actually consumes, under the Q1 column labels)."""
    rng = np.random.default_rng(2)
    n = 8
    dihedrals = rng.uniform(-np.pi + 0.3, np.pi - 0.3, (n, 4))
    bond = rng.normal([1.95, 2.03, 2.01, 2.10], 0.03, (n, 4))

    coords = nerf_build_backbone_np(
        phi=dihedrals[:, 0], psi=dihedrals[:, 1], omega=dihedrals[:, 2],
        dihedral_o=dihedrals[:, 3],
        bond_angle_ca_c=bond[:, 0], bond_angle_c_n=bond[:, 1],
        bond_angle_n_ca=bond[:, 2], bond_angle_c_o=bond[:, 3],
    ).reshape(n, 4, 3)

    res = [{"N": coords[i, 0], "CA": coords[i, 1], "C": coords[i, 2],
            "O": coords[i, 3]} for i in range(n)]
    extracted = extract_angle_dihedrals(res)

    # Correspondence (NERF places N_{j+1} with psi[j], CA_{j+1} with
    # omega[j], C_{j+1} with phi[j+1], O_j with dihedral_o[j]); extraction
    # at residue j (list index j-1) recovers:
    for j in range(1, n - 1):
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["psi"]), dihedrals[j, 1], atol=1e-4)
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["phi"]), dihedrals[j, 0], atol=1e-4)
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["omega"]), dihedrals[j - 1, 2],
            atol=1e-4)
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["dihedral_o"]), dihedrals[j, 3],
            atol=1e-4)
        # planar angles recover the sampled bond angles with NERF's
        # intrinsic off-by-one: the "tau" value at loop index i shapes
        # residue i+1's N:CA:C angle (create_pdb.py indexes bond angles by
        # loop step, Q1-family quirk), while CA:C:1N lands on residue j
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["theta1"]), bond[j - 1, 0],
            atol=1e-4)
        np.testing.assert_allclose(
            np.deg2rad(extracted[j - 1]["theta2"]), bond[j, 1], atol=1e-4)
