"""NERF reconstruction parity vs the reference NERFBuilder, JAX-vs-numpy
agreement, and PDB writing round-trips."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e3diff_tpu.data.dataset import FEATURE_NAMES  # noqa: E402
from e3diff_tpu.geometry import (  # noqa: E402
    angle_error_rate,
    create_chain_from_angles,
    nerf_build_backbone,
    nerf_build_backbone_np,
    write_pdb_folder,
)
from e3diff_tpu.geometry.pdb import read_backbone_pdb, write_backbone_pdb  # noqa: E402
from tests.reference_compat import load_reference_module  # noqa: E402


def _random_angles(n, seed=0):
    rng = np.random.default_rng(seed)
    dihedrals = rng.uniform(-np.pi, np.pi, (n, 4))
    bond = rng.normal([1.90, 2.03, 2.01, 2.10], 0.05, (n, 4))
    return np.concatenate([dihedrals, bond], axis=1)


@pytest.fixture(scope="module")
def ref_create_pdb():
    return load_reference_module("structure_model", "create_pdb",
                                 preload=("utils", "dataset"))


def test_nerf_np_parity_with_reference(ref_create_pdb):
    angles = _random_angles(10, seed=1)
    import pandas as pd

    df = dict(zip(FEATURE_NAMES, angles.T))
    builder = ref_create_pdb.NERFBuilder(
        phi_dihedrals=pd.Series(df["phi"]),
        psi_dihedrals=pd.Series(df["psi"]),
        omega_dihedrals=pd.Series(df["omega"]),
        oxygen_dihedrals=pd.Series(df["dihedral_o"]),
        bond_angle_ca_c=df["tau"],
        bond_angle_c_n=df["CA:C:1N"],
        bond_angle_n_ca=df["1C:N:CA"],
        bond_angle_c_o=df["CA:C:O"],
    )
    want = builder.centered_cartesian_coords
    got = nerf_build_backbone_np(
        phi=df["phi"], psi=df["psi"], omega=df["omega"],
        dihedral_o=df["dihedral_o"],
        bond_angle_ca_c=df["tau"], bond_angle_c_n=df["CA:C:1N"],
        bond_angle_n_ca=df["1C:N:CA"], bond_angle_c_o=df["CA:C:O"])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_nerf_np_parity_default_angles(ref_create_pdb):
    """Default idealized N-CA/CA-C/C-N angles. Note: the reference O pass
    always subscripts bond_angle_c_o[i], so a scalar default crashes there
    (a genuine reference bug — its real pipeline always passes the CA:C:O
    column); we pass a constant array to exercise the default-value path."""
    angles = _random_angles(8, seed=2)
    cols = dict(zip(FEATURE_NAMES, angles.T))
    const_co = np.full(8, 115 / 180 * np.pi)
    builder = ref_create_pdb.NERFBuilder(
        phi_dihedrals=cols["phi"], psi_dihedrals=cols["psi"],
        omega_dihedrals=cols["omega"], oxygen_dihedrals=cols["dihedral_o"],
        bond_angle_c_o=const_co)
    want = builder.centered_cartesian_coords
    got = nerf_build_backbone_np(
        phi=cols["phi"], psi=cols["psi"], omega=cols["omega"],
        dihedral_o=cols["dihedral_o"], bond_angle_c_o=const_co)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_nerf_jax_matches_numpy():
    angles = _random_angles(16, seed=3)
    cols = dict(zip(FEATURE_NAMES, angles.T))
    want = nerf_build_backbone_np(
        phi=cols["phi"], psi=cols["psi"], omega=cols["omega"],
        dihedral_o=cols["dihedral_o"],
        bond_angle_ca_c=cols["tau"], bond_angle_c_n=cols["CA:C:1N"],
        bond_angle_n_ca=cols["1C:N:CA"], bond_angle_c_o=cols["CA:C:O"])
    got = np.asarray(nerf_build_backbone(
        phi=cols["phi"], psi=cols["psi"], omega=cols["omega"],
        dihedral_o=cols["dihedral_o"],
        bond_angle_ca_c=cols["tau"], bond_angle_c_n=cols["CA:C:1N"],
        bond_angle_n_ca=cols["1C:N:CA"], bond_angle_c_o=cols["CA:C:O"]))
    # float32 recurrence over 16 residues: small drift tolerance
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_nerf_jax_jit_and_vmap():
    batch = np.stack([_random_angles(12, seed=s) for s in range(4)])

    @jax.jit
    def build(angles):
        return jax.vmap(lambda a: nerf_build_backbone(
            phi=a[:, 0], psi=a[:, 1], omega=a[:, 2], dihedral_o=a[:, 3],
            bond_angle_ca_c=a[:, 4], bond_angle_c_n=a[:, 5],
            bond_angle_n_ca=a[:, 6], bond_angle_c_o=a[:, 7]))(angles)

    out = np.asarray(build(jnp.asarray(batch, jnp.float32)))
    assert out.shape == (4, 48, 3)
    for i in range(4):
        want = nerf_build_backbone_np(
            phi=batch[i, :, 0], psi=batch[i, :, 1], omega=batch[i, :, 2],
            dihedral_o=batch[i, :, 3], bond_angle_ca_c=batch[i, :, 4],
            bond_angle_c_n=batch[i, :, 5], bond_angle_n_ca=batch[i, :, 6],
            bond_angle_c_o=batch[i, :, 7])
        np.testing.assert_allclose(out[i], want, atol=2e-4)


def test_bond_lengths_are_ideal():
    angles = _random_angles(10, seed=4)
    cols = dict(zip(FEATURE_NAMES, angles.T))
    coords = nerf_build_backbone_np(
        phi=cols["phi"], psi=cols["psi"], omega=cols["omega"],
        dihedral_o=cols["dihedral_o"]).reshape(10, 4, 3)
    n_ca = np.linalg.norm(coords[:, 1] - coords[:, 0], axis=1)
    ca_c = np.linalg.norm(coords[:, 2] - coords[:, 1], axis=1)
    c_o = np.linalg.norm(coords[:, 3] - coords[:, 2], axis=1)
    # first residue is the fixed 1CRN seed; check the built ones
    np.testing.assert_allclose(n_ca[1:], 1.46, atol=1e-6)
    np.testing.assert_allclose(ca_c[1:], 1.54, atol=1e-6)
    np.testing.assert_allclose(c_o, 1.22, atol=1e-6)
    c_n = np.linalg.norm(coords[1:, 0] - coords[:-1, 2], axis=1)
    np.testing.assert_allclose(c_n, 1.34, atol=1e-6)


def test_pdb_roundtrip(tmp_path):
    angles = _random_angles(6, seed=5)
    cols = dict(zip(FEATURE_NAMES, angles.T))
    coords = nerf_build_backbone_np(
        phi=cols["phi"], psi=cols["psi"], omega=cols["omega"],
        dihedral_o=cols["dihedral_o"])
    path = write_backbone_pdb(coords, str(tmp_path / "test.pdb"))
    back = read_backbone_pdb(path)
    np.testing.assert_allclose(back, coords, atol=1e-3)  # %8.3f columns
    text = open(path).read()
    assert "GLY A" in text and "CONECT" in text


def test_create_chain_nan_guard(tmp_path):
    angles = _random_angles(5, seed=6)
    angles[2, 0] = np.nan
    out = create_chain_from_angles(angles, str(tmp_path / "bad.pdb"))
    assert out == ""


def test_write_pdb_folder(tmp_path):
    samples = [_random_angles(5, seed=s) for s in range(3)]
    written = write_pdb_folder(samples, str(tmp_path / "out"))
    assert len(written) == 3
    assert all(w.endswith(".pdb") for w in written)


def test_angle_error_rate():
    a = _random_angles(10, seed=7)
    np.testing.assert_allclose(angle_error_rate(a, a), 0.0, atol=1e-12)
    assert angle_error_rate(a, a + 0.3).max() <= 0.5
