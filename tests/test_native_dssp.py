"""Native (dependency-free) structure engine: PDB parser + Kabsch-Sander
DSSP + Shrake-Rupley ASA, and the end-to-end native preprocessing path.

External dssp / biopython are absent in this environment, so parity is
established against physics instead: ideal NERF-built geometries must
produce the canonical assignments (alpha helix -> H with i->i-4 bonds,
3-10 helix -> G, extended strand -> unbonded), the H-bond energy formula
is checked against a hand-computed golden value, and the bridge/ladder
logic is unit-tested on synthetic bond patterns.
"""

import os

import numpy as np
import pytest

from e3diff_tpu.data.dssp import (
    _Entry,
    _hbond_energy,
    assign_secondary_structure,
    native_dssp_features,
    shrake_rupley_asa,
)
from e3diff_tpu.data.native_structure import (
    NativeAtom,
    NativeResidue,
    parse_pdb_chains,
)
from e3diff_tpu.geometry.nerf import nerf_build_backbone_np

BB_NAMES = ["N", "CA", "C", "O"]
BB_ELEMENTS = ["N", "C", "C", "O"]


def build_chain(phi_deg, psi_deg, n=14, resname="ALA", chain_id="A",
                offset=(0.0, 0.0, 0.0), start_res_id=1):
    phi = np.full(n, np.deg2rad(phi_deg))
    psi = np.full(n, np.deg2rad(psi_deg))
    omega = np.full(n, np.pi)
    dihedral_o = psi + np.pi
    coords = nerf_build_backbone_np(phi, psi, omega, dihedral_o)
    coords = coords.reshape(n, 4, 3) + np.asarray(offset)
    residues = []
    for i in range(n):
        atoms = {name: NativeAtom(name, coords[i, j], el, "")
                 for j, (name, el) in enumerate(zip(BB_NAMES, BB_ELEMENTS))}
        residues.append(NativeResidue(resname, start_res_id + i, "", atoms))
    return residues


def write_chains_pdb(chains, path):
    """Minimal multi-chain PDB writer for fixtures."""
    lines, serial = [], 0
    for chain_id, residues in chains.items():
        for res in residues:
            for name, el in zip(BB_NAMES, BB_ELEMENTS):
                serial += 1
                x, y, z = res[name].get_coord()
                lines.append(
                    f"ATOM  {serial:5d}  {name:<3s}{res.resname:>4s} "
                    f"{chain_id}{res.seq_num:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  5.00"
                    f"          {el:>2s}")
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def ss_string(feats):
    return "".join(f["secondary_structure"] for f in feats)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_pdb_parser_roundtrip(tmp_path):
    chains = {"A": build_chain(-57, -47, n=6),
              "B": build_chain(-57, -47, n=5, chain_id="B",
                               offset=(40.0, 0.0, 0.0))}
    path = write_chains_pdb(chains, str(tmp_path / "two_chain.pdb"))
    parsed = parse_pdb_chains(path)
    assert list(parsed) == ["A", "B"]
    assert [r.seq_num for r in parsed["A"]] == [1, 2, 3, 4, 5, 6]
    assert parsed["B"][0].get_id() == (" ", 1, " ")
    for orig, back in zip(chains["A"], parsed["A"]):
        for name in BB_NAMES:
            np.testing.assert_allclose(back[name].get_coord(),
                                       orig[name].get_coord(), atol=1e-3)
    assert "CA" in parsed["A"][0]
    assert parsed["A"][0].one_letter == "A"


def test_pdb_parser_altloc_icode_hetatm_model(tmp_path):
    text = "\n".join([
        "ATOM      1  N  AALA A   1      1.000   0.000   0.000  0.50  5.00           N",
        "ATOM      2  N  BALA A   1      9.000   9.000   9.000  0.50  5.00           N",
        "ATOM      3  CA  ALA A   1      2.000   0.000   0.000  1.00  5.00           C",
        "ATOM      4  N   GLY A   2A     3.000   0.000   0.000  1.00  5.00           N",
        "HETATM    5  N   MSE A   3      4.000   0.000   0.000  1.00  5.00           N",
        "HETATM    6  O   HOH A  99      8.000   8.000   8.000  1.00  5.00           O",
        "ENDMDL",
        "ATOM      7  N   ALA A   1     77.000   0.000   0.000  1.00  5.00           N",
        "END",
    ])
    path = str(tmp_path / "quirks.pdb")
    with open(path, "w") as f:
        f.write(text + "\n")
    chains = parse_pdb_chains(path)
    res = chains["A"]
    # altloc: first wins; second MODEL ignored; water HETATM ignored
    np.testing.assert_allclose(res[0]["N"].get_coord(), [1.0, 0.0, 0.0])
    assert len(res) == 3
    # insertion code captured, Biopython-style id tuple
    assert res[1].get_id() == (" ", 2, "A")
    assert res[1].full_id_str == "2A"
    # MSE kept as MET
    assert res[2].resname == "MSE" and res[2].one_letter == "M"


# ---------------------------------------------------------------------------
# secondary structure + H-bonds on ideal geometries
# ---------------------------------------------------------------------------

def test_alpha_helix_assigned_h():
    feats = native_dssp_features({"A": build_chain(-57, -47)})["A"]
    ss = ss_string(feats)
    assert set(ss[2:-2]) == {"H"}, ss
    # the classic i -> i-4 donor bonds with DSSP-typical energies
    mids = feats[5:10]
    assert all(f["NH_O_1_relidx"] == -4 for f in mids)
    assert all(f["NH_O_1_energy"] < -1.5 for f in mids)
    assert all(f["O_NH_1_relidx"] == 4 for f in mids)
    # first residue has no H donor (chain start): no acceptor bond stored
    assert feats[0]["NH_O_1_relidx"] == 0
    assert feats[0]["NH_O_1_energy"] == 0.0


def test_310_helix_assigned_g():
    feats = native_dssp_features({"A": build_chain(-49, -26)})["A"]
    ss = ss_string(feats)
    assert "G" in ss and "H" not in ss
    assert all(f["NH_O_1_relidx"] == -3 for f in feats[5:10])


def test_extended_strand_unassigned():
    feats = native_dssp_features({"A": build_chain(-139, 135)})["A"]
    ss = ss_string(feats)
    assert set(ss) <= {"-", "S", "T"}
    assert all(f["NH_O_1_energy"] > -0.5 for f in feats)


def test_separate_chains_break_connectivity():
    """Two far-apart chains: no cross-chain turns, both independent."""
    chains = {"A": build_chain(-57, -47, n=8),
              "B": build_chain(-57, -47, n=8, offset=(50.0, 0.0, 0.0),
                               start_res_id=1)}
    feats = native_dssp_features(chains)
    assert list(feats) == ["A", "B"]
    assert len(feats["A"]) == 8 and len(feats["B"]) == 8
    # chain B's first residue is a chain start (no H): no donor bond
    assert feats["B"][0]["NH_O_1_energy"] == 0.0


# ---------------------------------------------------------------------------
# H-bond energy golden + bridge logic unit tests
# ---------------------------------------------------------------------------

def _fake_entry(n_xyz, ca_xyz, c_xyz, o_xyz, h_xyz=None):
    e = _Entry("A", None, *(np.asarray(p, np.float64)
                            for p in (n_xyz, ca_xyz, c_xyz, o_xyz)))
    if h_xyz is not None:
        e.h = np.asarray(h_xyz, np.float64)
    e.connected_prev = True
    return e


def test_hbond_energy_golden():
    """Ideal linear N-H...O=C geometry, hand-computed Kabsch-Sander
    energy: E = 27.888*(1/2.9 + 1/3.14 - 1/1.9 - 1/4.14) = -2.914."""
    acceptor = _fake_entry([9, 9, 9], [9, 9, 9], [1.24, 0, 0], [0, 0, 0])
    donor = _fake_entry([-2.9, 0, 0], [9, 9, 9], [9, 9, 9], [9, 9, 9],
                        h_xyz=[-1.9, 0, 0])
    e = _hbond_energy(donor, acceptor)
    want = 27.888 * (1 / 2.9 + 1 / 3.14 - 1 / 1.9 - 1 / 4.14)
    np.testing.assert_allclose(e, want, rtol=1e-6)
    assert e < -0.5  # a real H-bond


def test_hbond_energy_no_donor_h():
    acceptor = _fake_entry([9, 9, 9], [9, 9, 9], [1.24, 0, 0], [0, 0, 0])
    donor = _fake_entry([-2.9, 0, 0], [9, 9, 9], [9, 9, 9], [9, 9, 9])
    assert _hbond_energy(donor, acceptor) == 0.0  # PRO / chain start


def _line_entries(n):
    """Straight-line CA trace (no bends), fully connected."""
    out = []
    for i in range(n):
        x = 10.0 * i  # far apart: no geometric H-bonds interfere
        out.append(_fake_entry([x, 0, 0], [x + 1, 0, 0], [x + 2, 0, 0],
                               [x + 2, 1, 0]))
    out[0].connected_prev = False
    return out


def _acceptors_from_bonds(n, bonds):
    """bonds: list of (donor, acceptor) -> best-two acceptor lists."""
    acc = [[(None, 0.0), (None, 0.0)] for _ in range(n)]
    for d, a in bonds:
        slot = 0 if acc[d][0][0] is None else 1
        acc[d][slot] = (a, -2.0)
    return acc


def test_antiparallel_ladder_marked_e():
    """Consecutive antiparallel bridges (i,j): HB(i,j) & HB(j,i) with
    j decreasing as i increases -> all four residues E."""
    n = 16
    bonds = []
    for i, j in [(4, 12), (5, 11)]:
        bonds += [(j, i), (i, j)]  # HB(i,j)=test(j,i): donor j, acceptor i
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert [ss[k] for k in (4, 5, 11, 12)] == ["E", "E", "E", "E"]


def test_isolated_bridge_marked_b():
    n = 16
    bonds = [(12, 4), (4, 12)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert ss[4] == "B" and ss[12] == "B"
    assert "E" not in ss


def test_parallel_ladder_marked_e():
    """Parallel bridges via HB(i-1,j) & HB(j,i+1) at consecutive i."""
    n = 16
    bonds = []
    for i, j in [(4, 10), (5, 11)]:
        bonds += [(j, i - 1), (i + 1, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert ss[4] == "E" and ss[5] == "E"
    assert ss[10] == "E" and ss[11] == "E"


def test_antiparallel_bulge_merges_ladders():
    """Beta bulge (Kabsch-Sander/mkdssp): two one-bridge ladders linked
    by a single-residue insertion on one strand merge into ONE ladder —
    all strand residues INCLUDING the bulge residue get E (without
    merging each bridge would be an isolated B)."""
    n = 26
    bonds = []
    for i, j in [(4, 20), (5, 18)]:   # residue 19 is the bulge
        bonds += [(j, i), (i, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert [ss[k] for k in (4, 5, 18, 19, 20)] == ["E"] * 5
    assert "B" not in ss


def test_parallel_bulge_merges_ladders():
    n = 26
    bonds = []
    for i, j in [(4, 14), (5, 16)]:   # residue 15 is the bulge
        bonds += [(j, i - 1), (i + 1, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert [ss[k] for k in (4, 5, 14, 15, 16)] == ["E"] * 5


def test_wide_bulge_merges_within_limits():
    """mkdssp merge window: i-gap < 3 allows a j-gap up to 5."""
    n = 30
    bonds = []
    for i, j in [(4, 22), (6, 17)]:   # i-gap 2, j-gap 5
        bonds += [(j, i), (i, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert [ss[k] for k in (4, 5, 6)] == ["E"] * 3
    assert [ss[k] for k in range(17, 23)] == ["E"] * 6


def test_distant_bridges_do_not_merge():
    """Bridges further apart than the bulge window stay isolated Bs."""
    n = 30
    bonds = []
    for i, j in [(4, 25), (10, 17)]:  # i-gap 6: beyond the window
        bonds += [(j, i), (i, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert ss[4] == "B" and ss[25] == "B"
    assert ss[10] == "B" and ss[17] == "B"
    assert "E" not in ss


def test_chain_break_blocks_bulge_merge():
    n = 30
    bonds = []
    # same geometry as test_wide_bulge_merges_within_limits ...
    for i, j in [(4, 22), (6, 17)]:
        bonds += [(j, i), (i, j)]
    entries = _line_entries(n)
    # ... but a chain break inside the j-strand span (between 19 and 20,
    # away from both bridges' own +-1 guards) blocks the merge
    entries[20].connected_prev = False
    ss = assign_secondary_structure(entries,
                                    _acceptors_from_bonds(n, bonds))
    assert ss[4] == "B" and ss[6] == "B"
    assert "E" not in ss


def test_g_requires_empty_run_mkdssp_order():
    """mkdssp assigns sheets before helices and writes G only when the
    whole 3-residue run is unassigned-or-G: a 3-10 candidate overlapping
    a strand residue yields NO G (the interior becomes T instead)."""
    n = 20
    bonds = [(6, 3), (7, 4)]          # 3-turns at 3 and 4 -> G run 4..6
    for i, j in [(6, 12), (7, 11)]:   # antiparallel ladder: 6 becomes E
        bonds += [(j, i), (i, j)]
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert ss[6] == "E"
    assert "G" not in ss
    assert ss[4] == "T" and ss[5] == "T"


def test_pi_helix_preference_overwrites_h():
    """Modern mkdssp (preferPiHelices default): an I run may claim
    residues already labelled H; with prefer_pi=False it may not."""
    n = 20
    bonds = [(7, 3), (8, 4),          # 4-turns at 3,4 -> H at 4..7
             (9, 4), (10, 5)]         # 5-turns at 4,5 -> I candidate 5..9
    entries = _line_entries(n)
    acc = _acceptors_from_bonds(n, bonds)
    ss = assign_secondary_structure(entries, acc)  # prefer_pi=True
    assert ss[4] == "H"
    assert [ss[k] for k in range(5, 10)] == ["I"] * 5
    ss2 = assign_secondary_structure(entries, acc, prefer_pi=False)
    assert [ss2[k] for k in range(4, 8)] == ["H"] * 4
    assert "I" not in ss2
    assert ss2[8] == "T" and ss2[9] == "T"


def test_helix_overwrites_sheet():
    """mkdssp writes H unconditionally after sheets: overlap -> H."""
    n = 20
    bonds = [(8, 4), (9, 5)]          # 4-turns at 4,5 -> H at 5..8
    for i, j in [(5, 15), (6, 14)]:
        bonds += [(j, i), (i, j)]     # ladder overlapping the helix
    ss = assign_secondary_structure(_line_entries(n),
                                    _acceptors_from_bonds(n, bonds))
    assert [ss[k] for k in range(5, 9)] == ["H"] * 4
    assert ss[14] == "E" and ss[15] == "E"


# ---------------------------------------------------------------------------
# accessibility
# ---------------------------------------------------------------------------

def test_asa_isolated_vs_buried():
    lone = NativeResidue("GLY", 1, "", {
        "CA": NativeAtom("CA", np.zeros(3), "C", "")})
    asa = shrake_rupley_asa({"A": [lone]})
    want = 4 * np.pi * (1.87 + 1.4) ** 2  # full sphere, CA radius + probe
    np.testing.assert_allclose(asa[id(lone)], want, rtol=1e-6)

    # surround a CA with a dense shell of atoms: ASA collapses
    center = NativeResidue("GLY", 1, "", {
        "CA": NativeAtom("CA", np.zeros(3), "C", "")})
    shell = []
    g = np.linspace(-2.4, 2.4, 4)
    k = 0
    for x in g:
        for y in g:
            for z in g:
                k += 1
                shell.append(NativeResidue("GLY", 10 + k, "", {
                    "CA": NativeAtom("CA", np.array([x, y, z]), "C", "")}))
    asa2 = shrake_rupley_asa({"A": [center], "B": shell})
    assert asa2[id(center)] < 0.05 * want


def test_helix_core_less_exposed_than_ends():
    feats = native_dssp_features({"A": build_chain(-57, -47)})["A"]
    rasa = [f["relative_ASA"] for f in feats]
    assert rasa[0] > 0.9  # terminal, fully exposed (backbone-only)
    assert max(rasa[5:9]) < 0.7  # helix core shielded by neighbors
    assert all(0.0 <= r <= 1.0 for r in rasa)


# ---------------------------------------------------------------------------
# end-to-end native preprocessing
# ---------------------------------------------------------------------------

def test_native_preprocess_end_to_end(tmp_path):
    """BioLiP TSV + a two-chain PDB -> parse_record(engine='native') ->
    filter_records: schema, trimming, pocket mapping, and angle roundtrip
    (extracted dihedrals == the NERF inputs)."""
    from e3diff_tpu.data.preprocessing import (
        filter_records, parse_record, resolve_engine)

    assert resolve_engine("auto") == "native"  # no biopython here

    receptor = build_chain(-57, -47, n=12, chain_id="A")
    ligand = build_chain(-139, 135, n=8, resname="GLY", chain_id="B",
                         offset=(30.0, 0.0, 0.0))
    folder = str(tmp_path)
    write_chains_pdb({"A": receptor, "B": ligand},
                     os.path.join(folder, "9xyz.pdb"))

    class Row:
        pdb_id = "9xyz"
        receptor_chain = "A"
        ligand_chain = "B"
        binding_site_pdb = "A3 A4 A7"

    ids, parsed = parse_record(Row(), folder, engine="native")
    assert parsed["msg"] is False
    assert ids["pdb_id"] == "9xyz"
    assert len(parsed["receptor"]) == 12 and len(parsed["ligand"]) == 8
    assert parsed["pocket_idx"] == [2, 3, 6]

    records = filter_records([[ids, parsed]])
    assert len(records) == 1
    rec = records[0]
    n_rec, n_lig = 10, 6  # first/last trimmed per chain
    assert rec["coors"].shape == (n_rec + n_lig, 3)
    assert rec["angle_features"].shape == (n_rec + n_lig, 8)
    assert rec["numerical_features"].shape == (n_rec + n_lig, 5)
    assert rec["ligand_mask"].sum() == n_lig
    assert list(rec["pocket_idx"]) == [2, 3, 6]
    assert set(rec["amino_acid"]) == {"A", "G"}

    # angle roundtrip: stored columns are deg2rad'ed Q1 order
    # [omega, phi, psi, dihedral_o, ...]; NERF inputs were
    # phi=-57deg, psi=-47deg, omega=pi for the receptor interior
    # (PDB fixed columns round coords to 1e-3 A -> ~1e-3 rad angle noise)
    interior = rec["angle_features"][1:n_rec - 1]  # angles of res 2..9
    np.testing.assert_allclose(np.abs(interior[:, 0]), np.pi, atol=2e-3)
    np.testing.assert_allclose(interior[:, 1], np.deg2rad(-57), atol=2e-3)
    np.testing.assert_allclose(interior[:, 2], np.deg2rad(-47), atol=2e-3)


def test_native_run_preprocessing_pipeline(tmp_path):
    """The full TSV-driven pipeline with the native engine, single worker,
    including the resolution filter and the ligand-length filter."""
    pd = pytest.importorskip("pandas")  # noqa: F841
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.data.preprocessing import run_preprocessing

    folder = str(tmp_path)
    write_chains_pdb(
        {"A": build_chain(-57, -47, n=12, chain_id="A"),
         "B": build_chain(-139, 135, n=9, resname="GLY", chain_id="B",
                          offset=(30.0, 0.0, 0.0))},
        os.path.join(folder, "1abc.pdb"))
    write_chains_pdb(
        {"A": build_chain(-57, -47, n=10, chain_id="A"),
         "B": build_chain(-57, -47, n=4, resname="GLY", chain_id="B",
                          offset=(30.0, 0.0, 0.0))},
        os.path.join(folder, "2def.pdb"))

    def tsv_row(pdb_id, resolution):
        cols = [pdb_id, "A", str(resolution), "bs1", "PEP", "B", "1",
                "A3 A4", "A3 A4", "", "", "", "", "", "", "", "", "", "",
                "5", "SEQ"]
        return "\t".join(cols)

    meta = os.path.join(folder, "meta.tsv")
    with open(meta, "w") as f:
        # 2def has a 4-residue ligand (< 5, reference filter counts the
        # UNTRIMMED chain): filtered out;
        # 3ghi fails the resolution < 5 cut; 4jkl has no structure file
        # (per-record fault isolation keeps the run alive)
        f.write("\n".join([tsv_row("1abc", 2.0), tsv_row("2def", 2.0),
                           tsv_row("3ghi", 9.0), tsv_row("4jkl", 2.0)]) + "\n")

    out = os.path.join(folder, "out.pkl")
    records = run_preprocessing(meta, folder, out, workers=1,
                                engine="native")
    assert len(records) == 1
    assert records[0]["structure_ids"]["pdb_id"] == "1abc"
    assert len(load_complexes(out)) == 1
    # engine stamp: datasets record which DSSP engine produced them so a
    # mixed-engine corpus is detectable downstream (advisor r2)
    assert records[0]["preprocess_engine"] == "native"
    assert load_complexes(out)[0]["preprocess_engine"] == "native"


def test_mixed_engine_corpus_warns():
    from e3diff_tpu.data.dataset import LigandBindingSiteData

    def fake_record(engine):
        n = 12
        return {
            "amino_acid": ["A"] * n,
            "angle_features": np.zeros((n, 8), np.float32),
            "ligand_mask": np.arange(n) >= 6,
            "pocket_mask": np.arange(n) < 3,
            "structure_ids": {"pdb_id": "xxxx"},
            "preprocess_engine": engine,
        }

    with pytest.warns(UserWarning, match="mixes preprocessing engines"):
        LigandBindingSiteData(
            [fake_record("native"), fake_record("biopython")],
            split=None, max_len=16, pocket_ext=0)
