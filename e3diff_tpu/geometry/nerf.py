"""NERF (Natural Extension Reference Frame) backbone reconstruction.

Rebuild of structure_model/create_pdb.py:40-234: place N/CA/C atoms
sequentially from dihedral triples (psi_i, omega_i, phi_{i+1}) and
per-residue bond angles, then place each carbonyl O from its residue's
(N, CA, C) frame + dihedral_o + CA:C:O angle.

Two implementations with identical semantics:
* ``nerf_build_backbone_np`` — plain NumPy float64, the verification oracle;
* ``nerf_build_backbone`` — JAX: the inherently sequential N/CA/C recurrence
  as a ``lax.scan`` over residues (3 placements per step), and the O pass
  fully vectorized (no recurrence). jit- and vmap-compatible, so a batch of
  peptides reconstructs in one compiled call on TPU.

Constants (create_pdb.py:23-32, 55-58): bond lengths N-CA 1.46, CA-C 1.54,
C-N 1.34, C-O 1.22 A; default bond angles 121/109/115/115 deg; initial
coords = the first three atoms (N, CA, C) of 1CRN.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

N_CA_LENGTH = 1.46
CA_C_LENGTH = 1.54
C_N_LENGTH = 1.34
C_O_LENGTH = 1.22

N_INIT = np.array([17.047, 14.099, 3.625])
CA_INIT = np.array([16.967, 12.784, 4.338])
C_INIT = np.array([15.685, 12.755, 5.133])

NERF_DEFAULTS = {
    "bond_len_n_ca": N_CA_LENGTH,
    "bond_len_ca_c": CA_C_LENGTH,
    "bond_len_c_n": C_N_LENGTH,
    "bond_len_c_o": C_O_LENGTH,
    "bond_angle_n_ca": 121 / 180 * np.pi,
    "bond_angle_ca_c": 109 / 180 * np.pi,   # tau
    "bond_angle_c_n": 115 / 180 * np.pi,
    "bond_angle_c_o": 115 / 180 * np.pi,
}


def place_dihedral(a, b, c, bond_angle, bond_length, torsion_angle):
    """Place point d after a->b->c with the given internal coordinates
    (create_pdb.py:175-234). NumPy, single points (the oracle path)."""
    ab = b - a
    bc = c - b
    bc = bc / np.linalg.norm(bc)
    n = np.cross(ab, bc)
    n = n / np.linalg.norm(n)
    nbc = np.cross(n, bc)
    m = np.stack([bc, nbc, n], axis=-1)
    d = np.array([
        -bond_length * np.cos(bond_angle),
        bond_length * np.cos(torsion_angle) * np.sin(bond_angle),
        bond_length * np.sin(torsion_angle) * np.sin(bond_angle),
    ])
    return m.dot(d) + c


def _as_per_residue(v, n):
    v = np.asarray(v, dtype=np.float64)
    return np.full(n, float(v)) if v.ndim == 0 else v.astype(np.float64)


def nerf_build_backbone_np(
    phi, psi, omega, dihedral_o,
    bond_angle_n_ca=NERF_DEFAULTS["bond_angle_n_ca"],
    bond_angle_ca_c=NERF_DEFAULTS["bond_angle_ca_c"],
    bond_angle_c_n=NERF_DEFAULTS["bond_angle_c_n"],
    bond_angle_c_o=NERF_DEFAULTS["bond_angle_c_o"],
    bond_len_n_ca=N_CA_LENGTH, bond_len_ca_c=CA_C_LENGTH,
    bond_len_c_n=C_N_LENGTH, bond_len_c_o=C_O_LENGTH,
    center: bool = True,
) -> np.ndarray:
    """NumPy oracle. Returns (4*n, 3) coords ordered N,CA,C,O per residue."""
    phi = np.asarray(phi, np.float64)
    n = phi.shape[0]
    dih = np.stack([np.asarray(psi, np.float64)[:-1],
                    np.asarray(omega, np.float64)[:-1],
                    phi[1:]], axis=1)                       # (n-1, 3)
    ang_cn = _as_per_residue(bond_angle_c_n, n)
    ang_nca = _as_per_residue(bond_angle_n_ca, n)
    ang_cac = _as_per_residue(bond_angle_ca_c, n)
    ang_co = _as_per_residue(bond_angle_c_o, n)
    len_seq = [bond_len_c_n, bond_len_n_ca, bond_len_ca_c]

    coords = [N_INIT.copy(), CA_INIT.copy(), C_INIT.copy()]
    for i in range(n - 1):
        angles_i = [ang_cn[i], ang_nca[i], ang_cac[i]]
        for j in range(3):
            coords.append(place_dihedral(
                coords[-3], coords[-2], coords[-1],
                bond_angle=angles_i[j], bond_length=len_seq[j],
                torsion_angle=dih[i, j]))
    bb = np.asarray(coords).reshape(n, 3, 3)
    dih_o = np.asarray(dihedral_o, np.float64)
    o = np.stack([
        place_dihedral(bb[i, 0], bb[i, 1], bb[i, 2],
                       bond_angle=ang_co[i], bond_length=float(bond_len_c_o),
                       torsion_angle=dih_o[i])
        for i in range(n)])
    out = np.concatenate([bb, o[:, None]], axis=1).reshape(n * 4, 3)
    if center:
        out = out - out.mean(axis=0)
    return out


def _place_jnp(a, b, c, bond_angle, bond_length, torsion_angle):
    ab = b - a
    bc = c - b
    bc = bc / jnp.linalg.norm(bc, axis=-1, keepdims=True)
    nrm = jnp.cross(ab, bc)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nbc = jnp.cross(nrm, bc)
    m = jnp.stack([bc, nbc, nrm], axis=-1)
    d = jnp.stack([
        -bond_length * jnp.cos(bond_angle),
        bond_length * jnp.cos(torsion_angle) * jnp.sin(bond_angle),
        bond_length * jnp.sin(torsion_angle) * jnp.sin(bond_angle),
    ], axis=-1)
    return jnp.einsum("...ij,...j->...i", m, d) + c


def nerf_build_backbone(
    phi, psi, omega, dihedral_o,
    bond_angle_n_ca=None, bond_angle_ca_c=None,
    bond_angle_c_n=None, bond_angle_c_o=None,
    center: bool = True,
):
    """JAX NERF: (n,)-arrays in, (4n, 3) float32 coords out.

    Bond angles default to the idealized constants; pass (n,) arrays to use
    sampled per-residue values. Sequence length must be static under jit.
    """
    phi = jnp.asarray(phi, jnp.float32)
    n = phi.shape[0]

    def per_res(v, default):
        if v is None:
            return jnp.full((n,), default, jnp.float32)
        v = jnp.asarray(v, jnp.float32)
        return jnp.broadcast_to(v, (n,))

    ang_cn = per_res(bond_angle_c_n, NERF_DEFAULTS["bond_angle_c_n"])
    ang_nca = per_res(bond_angle_n_ca, NERF_DEFAULTS["bond_angle_n_ca"])
    ang_cac = per_res(bond_angle_ca_c, NERF_DEFAULTS["bond_angle_ca_c"])
    ang_co = per_res(bond_angle_c_o, NERF_DEFAULTS["bond_angle_c_o"])

    dih = jnp.stack([jnp.asarray(psi, jnp.float32)[:-1],
                     jnp.asarray(omega, jnp.float32)[:-1],
                     phi[1:]], axis=1)                      # (n-1, 3)
    angles = jnp.stack([ang_cn[:-1], ang_nca[:-1], ang_cac[:-1]], axis=1)
    lengths = jnp.asarray([C_N_LENGTH, N_CA_LENGTH, CA_C_LENGTH], jnp.float32)

    init = jnp.asarray(np.stack([N_INIT, CA_INIT, C_INIT]), jnp.float32)

    def body(carry, inputs):
        dih_i, ang_i = inputs
        a, b, c = carry
        new = []
        for j in range(3):
            d = _place_jnp(a, b, c, ang_i[j], lengths[j], dih_i[j])
            a, b, c = b, c, d
            new.append(d)
        return (a, b, c), jnp.stack(new)

    (_, _, _), rest = jax.lax.scan(
        body, (init[0], init[1], init[2]), (dih, angles))
    bb = jnp.concatenate([init[None], rest], axis=0)        # (n, 3, 3)
    o = _place_jnp(bb[:, 0], bb[:, 1], bb[:, 2],
                   ang_co, C_O_LENGTH, jnp.asarray(dihedral_o, jnp.float32))
    out = jnp.concatenate([bb, o[:, None]], axis=1).reshape(n * 4, 3)
    if center:
        out = out - out.mean(axis=0)
    return out
