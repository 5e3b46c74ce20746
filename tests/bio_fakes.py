"""Duck-typed Bio.PDB / Bio.PDB.DSSP fakes backed by the native engine.

Purpose: the biopython branch of `e3diff_tpu.data.preprocessing`
(`extract_dssp_features`, `create_res_id_map`, `parse_record`'s
engine='biopython' path — mirroring the reference
clean_data/data_preprocessing.py:746-831) shells out to Biopython and an
external mkdssp binary, neither of which exists in this environment.
These fakes implement exactly the Biopython surface that code touches —
``PDBParser/MMCIFParser.get_structure(...)[0][chain]``,
``chain.get_residues()``, ``DSSP(structure, path)`` with its
keys()/__getitem__ tuple layout — on top of the native parser
(data/native_structure.py) and native DSSP (data/dssp.py), so the branch
executes under test and its output can be pinned equal to the native
engine's record-for-record.

Install with the ``install(monkeypatch)`` helper (sys.modules injection,
undone automatically by pytest's monkeypatch).
"""

from __future__ import annotations

import sys
import types

from e3diff_tpu.data.dssp import native_dssp_features
from e3diff_tpu.data.native_structure import parse_structure_chains


class FakeChain:
    def __init__(self, residues):
        self._residues = residues

    def get_residues(self):
        return list(self._residues)


class FakeModel:
    """`structure[0]` result: maps chain id -> FakeChain."""

    def __init__(self, chains):
        self._chains = {cid: FakeChain(res) for cid, res in chains.items()}

    def __getitem__(self, chain_id):
        return self._chains[chain_id]


class FakeStructure:
    def __init__(self, chains):
        self._model = FakeModel(chains)
        self.chains = chains  # the raw native dict, for the DSSP fake

    def __getitem__(self, model_idx):
        assert model_idx == 0  # reference always takes the first model
        return self._model


class _FakeParser:
    def __init__(self, QUIET=False):
        self.QUIET = QUIET

    def get_structure(self, name, path):
        return FakeStructure(parse_structure_chains(path))


class FakePDBParser(_FakeParser):
    pass


class FakeMMCIFParser(_FakeParser):
    pass


class FakeDSSP:
    """Biopython DSSP surface: keys() -> (chain_id, residue_id_tuple);
    __getitem__ -> the 14-slot tuple (index, aa, ss, rel ASA, phi, psi,
    NH_O_1_relidx, NH_O_1_energy, O_NH_1_relidx, O_NH_1_energy,
    NH_O_2_relidx, NH_O_2_energy, O_NH_2_relidx, O_NH_2_energy) — the
    slots extract_dssp_features reads ([1],[2],[3],[6..13])."""

    def __init__(self, structure, file_path, *args, **kwargs):
        # like the real class: DSSP re-reads the file (it shells out to
        # mkdssp on file_path), so parse from disk rather than trusting
        # `structure`
        chains = (structure.chains if isinstance(structure, FakeStructure)
                  else parse_structure_chains(file_path))
        self._data = {}
        self._keys = []
        i = 0
        for chain_id, feats in native_dssp_features(chains).items():
            for f in feats:
                res = f["res"]
                key = (chain_id, res.get_id())
                self._keys.append(key)
                self._data[key] = (
                    i, f["amino_acid"], f["secondary_structure"],
                    f["relative_ASA"], 0.0, 0.0,
                    f["NH_O_1_relidx"], f["NH_O_1_energy"],
                    f["O_NH_1_relidx"], f["O_NH_1_energy"],
                    f["NH_O_2_relidx"], f["NH_O_2_energy"],
                    f["O_NH_2_relidx"], f["O_NH_2_energy"],
                )
                i += 1

    def keys(self):
        return list(self._keys)

    def __getitem__(self, key):
        return self._data[key]


def make_modules():
    """Fresh fake Bio / Bio.PDB / Bio.PDB.DSSP module objects."""
    bio = types.ModuleType("Bio")
    pdb = types.ModuleType("Bio.PDB")
    dssp_mod = types.ModuleType("Bio.PDB.DSSP")
    dssp_mod.DSSP = FakeDSSP
    pdb.PDBParser = FakePDBParser
    pdb.MMCIFParser = FakeMMCIFParser
    pdb.DSSP = dssp_mod
    bio.PDB = pdb
    return {"Bio": bio, "Bio.PDB": pdb, "Bio.PDB.DSSP": dssp_mod}


def install(monkeypatch):
    """Inject the fakes into sys.modules (pytest monkeypatch reverts)."""
    for name, mod in make_modules().items():
        monkeypatch.setitem(sys.modules, name, mod)
