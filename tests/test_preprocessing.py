"""Parity tests for the preprocessing geometry + record assembly vs the
reference clean_data/data_preprocessing.py (loaded read-only with Bio
stubbed — the pure functions under test don't touch Biopython)."""

import sys
import types

import numpy as np
import pytest

from e3diff_tpu.data.preprocessing import (
    calc_angle,
    calc_dihedral,
    extract_angle_dihedrals,
    build_complex_record,
    filter_records,
)


@pytest.fixture(scope="module")
def ref_prep():
    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        pdb = types.ModuleType("Bio.PDB")
        dssp = types.ModuleType("Bio.PDB.DSSP")
        chain = types.ModuleType("Bio.PDB.Chain")
        dssp.DSSP = object
        chain.Chain = object
        pdb.MMCIFParser = object
        pdb.PDBParser = object
        pdb.DSSP = dssp
        pdb.Chain = chain
        bio.PDB = pdb
        sys.modules.update({
            "Bio": bio, "Bio.PDB": pdb, "Bio.PDB.DSSP": dssp,
            "Bio.PDB.Chain": chain})
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_preprocessing",
        "/root/reference/clean_data/data_preprocessing.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_calc_angle_parity(ref_prep):
    rng = np.random.default_rng(0)
    for _ in range(50):
        p = rng.normal(size=(3, 3))
        np.testing.assert_allclose(
            calc_angle(*p), ref_prep.calc_angle(*p), rtol=1e-12)


def test_calc_dihedral_parity(ref_prep):
    rng = np.random.default_rng(1)
    for _ in range(50):
        p = rng.normal(size=(4, 3))
        np.testing.assert_allclose(
            calc_dihedral(*p), ref_prep.calc_dihedral(*p), rtol=1e-10)


class _FakeAtom:
    def __init__(self, xyz):
        self._xyz = np.asarray(xyz)

    def get_coord(self):
        return self._xyz


class _FakeResidue:
    def __init__(self, coords):
        self._atoms = {k: _FakeAtom(v) for k, v in coords.items()}

    def __getitem__(self, key):
        return self._atoms[key]


def _chain_coords(n, seed):
    """Synthetic but chain-like backbone coordinates."""
    rng = np.random.default_rng(seed)
    base = np.cumsum(rng.normal(1.2, 0.3, size=(n, 3)), axis=0)
    out = []
    for i in range(n):
        out.append({
            "N": base[i] + rng.normal(0, 0.2, 3),
            "CA": base[i] + [1.0, 0, 0] + rng.normal(0, 0.2, 3),
            "C": base[i] + [2.0, 0.5, 0] + rng.normal(0, 0.2, 3),
            "O": base[i] + [2.5, 1.5, 0] + rng.normal(0, 0.2, 3),
        })
    return out


def test_extract_angle_dihedrals_parity(ref_prep):
    coords = _chain_coords(8, seed=2)
    got = extract_angle_dihedrals(coords)
    want = ref_prep.extract_angle_dihedrals(
        [_FakeResidue(c) for c in coords])
    assert len(got) == len(want) == 6
    for g, w in zip(got, want):
        assert list(g.keys()) == list(w.keys())  # Q1 insertion order
        for k in g:
            np.testing.assert_allclose(g[k], w[k], rtol=1e-10)


def _fake_residue_features(n, seed, aa="A"):
    rng = np.random.default_rng(seed)
    coords = _chain_coords(n, seed)
    feats = []
    for i in range(n):
        feats.append({
            "alpha_carbon_coord": list(coords[i]["CA"]),
            "amino_acid": aa,
            "secondary_structure": "H" if i % 3 else "P",
            "relative_ASA": float(rng.random()),
            "NH_O_1_relidx": 0, "NH_O_1_energy": float(rng.random()),
            "O_NH_1_relidx": 0, "O_NH_1_energy": float(rng.random()),
            "NH_O_2_relidx": 0, "NH_O_2_energy": float(rng.random()),
            "O_NH_2_relidx": 0, "O_NH_2_energy": float(rng.random()),
        })
    for i, ang in enumerate(extract_angle_dihedrals(coords)):
        feats[i + 1].update(ang)
    return feats


def test_build_complex_record_schema():
    receptor = _fake_residue_features(10, seed=3)
    ligand = _fake_residue_features(7, seed=4)
    rec = build_complex_record(
        {"pdb_id": "test", "receptor_chain": "A", "ligand_chain": "B"},
        receptor, ligand, pocket_idx=[2, 3, 5])
    n = 8 + 5  # trimmed lengths
    assert rec["angle_features"].shape == (n, 8)
    assert rec["numerical_features"].shape == (n, 5)
    assert rec["coors"].shape == (n, 3)
    assert rec["ligand_mask"].sum() == 5
    assert rec["pocket_mask"].sum() == 3
    assert len(rec["amino_acid"]) == n
    # 'P' secondary structure remapped to '-'
    assert "P" not in rec["secondary_structure"]
    # angles are radians
    assert np.abs(rec["angle_features"]).max() <= np.pi + 1e-6
    # edge_index = full bipartite ligand x pocket
    assert rec["edge_index"].shape == (2, 5 * 3)
    # numerical features = [relative_ASA, 4 energies] (stride-2 slice)
    np.testing.assert_allclose(
        rec["numerical_features"][0, 0], receptor[1]["relative_ASA"])
    np.testing.assert_allclose(
        rec["numerical_features"][0, 1], receptor[1]["NH_O_1_energy"])


def test_build_complex_record_feeds_dataset():
    from e3diff_tpu.data import LigandBindingSiteData

    recs = []
    for s in range(3):
        receptor = _fake_residue_features(12, seed=10 + s)
        ligand = _fake_residue_features(8, seed=20 + s)
        recs.append(build_complex_record(
            {"pdb_id": f"t{s}", "receptor_chain": "A", "ligand_chain": "B"},
            receptor, ligand, pocket_idx=[1, 4]))
    ds = LigandBindingSiteData(recs, None, max_len=32, pocket_ext=1)
    assert len(ds) == 3
    b = next(ds.batches(3))
    assert b["ligand_angles"].shape == (3, 32, 8)


def test_filter_records():
    def feats(n, aa):
        return [{"amino_acid": aa, **{}} for _ in range(n)]

    def full(n, seed, aa="A"):
        return _fake_residue_features(n, seed, aa=aa)

    parsed = [
        [{"pdb_id": "ok"}, {"receptor": full(10, 1), "ligand": full(7, 2),
                            "pocket_idx": [1], "msg": False}],
        [{"pdb_id": "err"}, {"msg": "boom"}],
        [{"pdb_id": "xseq"}, {"receptor": full(10, 3, aa="X"),
                              "ligand": full(7, 4),
                              "pocket_idx": [1], "msg": False}],
        [{"pdb_id": "short"}, {"receptor": full(10, 5), "ligand": full(4, 6),
                               "pocket_idx": [1], "msg": False}],
    ]
    out = filter_records(parsed)
    assert len(out) == 1
    assert out[0]["structure_ids"]["pdb_id"] == "ok"


def test_resolve_engine_auto_requires_dssp_binary(monkeypatch):
    """auto must not pick biopython when the external dssp binary is
    missing — Bio.PDB.DSSP shells out to mkdssp, so biopython alone
    fails on every record (silent zero-complex runs otherwise)."""
    from e3diff_tpu.data import preprocessing as prep

    monkeypatch.setattr(prep, "has_biopython", lambda: True)
    monkeypatch.setattr(prep, "find_dssp_binary", lambda: None)
    assert prep.resolve_engine("auto") == "native"

    monkeypatch.setattr(prep, "find_dssp_binary", lambda: "/usr/bin/mkdssp")
    assert prep.resolve_engine("auto") == "biopython"

    monkeypatch.setattr(prep, "has_biopython", lambda: False)
    assert prep.resolve_engine("auto") == "native"

    with pytest.raises(ValueError):
        prep.resolve_engine("mystery")
