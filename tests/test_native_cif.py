"""Native mmCIF reader (`_atom_site` loop) — equivalence with the PDB
reader and mmCIF-specific edge cases (quoting, altlocs, models, HETATM
MSE, insertion codes), plus the preprocessing native engine reading a
.cif-only structure folder (the reference falls back to MMCIFParser when
no .pdb exists, clean_data/data_preprocessing.py:785-791)."""

import os

import numpy as np

from e3diff_tpu.data.native_structure import (
    _cif_tokens,
    parse_cif_chains,
    parse_pdb_chains,
    parse_structure_chains,
)
from test_native_dssp import BB_ELEMENTS, BB_NAMES, build_chain, \
    write_chains_pdb

CIF_FIELDS = [
    "group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
    "label_comp_id", "label_asym_id", "label_seq_id", "pdbx_PDB_ins_code",
    "Cartn_x", "Cartn_y", "Cartn_z", "occupancy", "auth_seq_id",
    "auth_comp_id", "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num",
]


def write_chains_cif(chains, path, model_num=1):
    """Minimal `_atom_site` writer mirroring write_chains_pdb."""
    lines = ["data_fixture", "#", "loop_"]
    lines += [f"_atom_site.{f}" for f in CIF_FIELDS]
    serial = 0
    for chain_id, residues in chains.items():
        for res in residues:
            for name, el in zip(BB_NAMES, BB_ELEMENTS):
                serial += 1
                x, y, z = res[name].get_coord()
                icode = res.icode if res.icode else "?"
                lines.append(
                    f"ATOM {serial} {el} {name} . {res.resname} X "
                    f"{res.seq_num} {icode} {x:.3f} {y:.3f} {z:.3f} "
                    f"1.00 {res.seq_num} {res.resname} {chain_id} "
                    f"{name} {model_num}")
    lines.append("#")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def test_cif_tokens_quoting():
    assert _cif_tokens("ATOM 1 C CA . ALA") == \
        ["ATOM", "1", "C", "CA", ".", "ALA"]
    # quotes end only before whitespace; O5' style names survive
    assert _cif_tokens("'O5'' \"N H1\" plain") == ["O5'", "N H1", "plain"]
    assert _cif_tokens("  a   b  # trailing comment") == ["a", "b"]


def test_cif_matches_pdb_reader(tmp_path):
    chains = {
        "A": build_chain(-57, -47, n=10, chain_id="A"),
        "B": build_chain(-139, 135, n=6, resname="GLY", chain_id="B",
                         offset=(20.0, 0.0, 0.0)),
    }
    pdb = write_chains_pdb(chains, str(tmp_path / "x.pdb"))
    cif = write_chains_cif(chains, str(tmp_path / "x.cif"))
    from_pdb = parse_pdb_chains(pdb)
    from_cif = parse_cif_chains(cif)
    assert from_pdb.keys() == from_cif.keys()
    for cid in from_pdb:
        assert len(from_pdb[cid]) == len(from_cif[cid])
        for rp, rc in zip(from_pdb[cid], from_cif[cid]):
            assert (rp.resname, rp.seq_num, rp.icode) == \
                   (rc.resname, rc.seq_num, rc.icode)
            assert rp.atoms.keys() == rc.atoms.keys()
            for name in rp.atoms:
                np.testing.assert_allclose(
                    rp[name].get_coord(), rc[name].get_coord(), atol=1e-3)
                assert rp[name].element == rc[name].element
    # extension dispatch
    assert parse_structure_chains(cif).keys() == from_cif.keys()
    assert parse_structure_chains(pdb).keys() == from_pdb.keys()


def test_cif_edge_cases(tmp_path):
    rows = "\n".join([
        "data_edge", "loop_",
        *(f"_atom_site.{f}" for f in CIF_FIELDS),
        # altloc A kept, B dropped (first wins)
        "ATOM 1 N N A ALA X 1 ? 0.0 0.0 0.0 0.5 1 ALA A N 1",
        "ATOM 2 N N B ALA X 1 ? 9.0 9.0 9.0 0.5 1 ALA A N 1",
        # insertion code
        "ATOM 3 N N . ALA X 1 A 1.0 0.0 0.0 1.0 1 ALA A N 1",
        # HETATM MSE kept, HETATM HOH dropped
        "HETATM 4 SE SE . MSE X 2 ? 2.0 0.0 0.0 1.0 2 MSE A SE 1",
        "HETATM 5 O O . HOH X 3 ? 3.0 0.0 0.0 1.0 3 HOH A O 1",
        # quoted atom name
        "ATOM 6 C 'CA' . ALA X 4 ? 4.0 0.0 0.0 1.0 4 ALA A 'CA' 1",
        # second model ignored
        "ATOM 7 N N . ALA X 5 ? 5.0 0.0 0.0 1.0 5 ALA A N 2",
        "#",
    ])
    path = str(tmp_path / "edge.cif")
    with open(path, "w") as f:
        f.write(rows + "\n")
    chains = parse_cif_chains(path)
    assert list(chains.keys()) == ["A"]
    res = chains["A"]
    ids = [(r.resname, r.seq_num, r.icode) for r in res]
    assert ids == [("ALA", 1, ""), ("ALA", 1, "A"), ("MSE", 2, ""),
                   ("ALA", 4, "")]
    np.testing.assert_allclose(res[0]["N"].get_coord(), [0, 0, 0])  # altloc A
    assert res[2].one_letter == "M"  # MSE -> MET
    assert "CA" in res[3]  # quoted name unquoted


def test_native_engine_reads_cif_only_folder(tmp_path):
    from e3diff_tpu.data.preprocessing import filter_records, parse_record

    chains = {
        "A": build_chain(-57, -47, n=12, chain_id="A"),
        "B": build_chain(-70, -40, n=8, chain_id="B",
                         offset=(16.0, 3.0, 0.0)),
    }
    write_chains_cif(chains, str(tmp_path / "9cif.cif"))

    class Row:
        pdb_id = "9cif"
        receptor_chain = "A"
        ligand_chain = "B"
        binding_site_pdb = "A3 A4 A7"

    ids, parsed = parse_record(Row(), str(tmp_path), engine="native")
    assert parsed["msg"] is False
    records = filter_records([[ids, parsed]])
    assert len(records) == 1
    assert records[0]["angle_features"].shape == (10 + 6, 8)
    assert list(records[0]["pocket_idx"]) == [2, 3, 6]


def test_cif_blank_and_comment_lines_mid_loop(tmp_path):
    """Blank/comment lines inside _atom_site are insignificant (CIF
    grammar), not loop terminators; malformed short rows warn instead of
    silently vanishing."""
    import warnings as warnings_mod

    rows = "\n".join([
        "data_gap", "loop_",
        *(f"_atom_site.{f}" for f in CIF_FIELDS),
        "ATOM 1 N N . ALA X 1 ? 0.0 0.0 0.0 1.0 1 ALA A N 1",
        "",
        "# a stray comment",
        "ATOM 2 C CA . ALA X 1 ? 1.0 0.0 0.0 1.0 1 ALA A CA 1",
        "ATOM 3 C C",  # wrapped/truncated row -> warning, skipped
        "ATOM 4 C C . ALA X 1 ? 2.0 0.0 0.0 1.0 1 ALA A C 1",
        "loop_",  # a new loop genuinely ends atom_site
        "_other.field",
        "ATOM 9 N N . ALA X 9 ? 9.0 9.0 9.0 1.0 9 ALA A N 1",
    ])
    path = str(tmp_path / "gap.cif")
    with open(path, "w") as f:
        f.write(rows + "\n")
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        chains = parse_cif_chains(path)
    assert [str(w.message) for w in caught
            if "_atom_site row" in str(w.message)]
    res = chains["A"]
    assert len(res) == 1
    assert set(res[0].atoms) == {"N", "CA", "C"}  # atoms after the gap kept


def test_pdb_element_fallback_hydrogen_names(tmp_path):
    """PDB lines without element columns: digit-prefixed hydrogen names
    ('1HB2') must resolve to element H so ASA excludes them."""
    lines = [
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000",
        "ATOM      2 1HB2 ALA A   1       1.000   0.000   0.000",
    ]
    path = str(tmp_path / "noel.pdb")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    res = parse_pdb_chains(path)["A"][0]
    assert res["N"].element == "N"
    assert res["1HB2"].element == "H"


def test_gz_compressed_readers(tmp_path):
    """Both readers accept .gz-compressed files (BioLiP archives ship
    gzipped structures)."""
    import gzip

    chains = {"A": build_chain(-57, -47, n=8, chain_id="A")}
    pdb = write_chains_pdb(chains, str(tmp_path / "x.pdb"))
    cif = write_chains_cif(chains, str(tmp_path / "x.cif"))
    for src, dst in [(pdb, "x.pdb.gz"), (cif, "x.cif.gz")]:
        with open(src, "rb") as f_in, \
                gzip.open(str(tmp_path / dst), "wb") as f_out:
            f_out.write(f_in.read())
    plain = parse_pdb_chains(pdb)
    gz = parse_structure_chains(str(tmp_path / "x.pdb.gz"))
    cif_gz = parse_structure_chains(str(tmp_path / "x.cif.gz"))
    for parsed in (gz, cif_gz):
        assert [r.seq_num for r in parsed["A"]] == \
               [r.seq_num for r in plain["A"]]
        np.testing.assert_allclose(parsed["A"][0]["CA"].get_coord(),
                                   plain["A"][0]["CA"].get_coord(),
                                   atol=1e-3)
