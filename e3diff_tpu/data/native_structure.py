"""Dependency-free PDB parsing for the preprocessing pipeline.

The reference preprocessing (clean_data/data_preprocessing.py:776-791)
parses structures with Biopython's PDBParser/MMCIFParser, which is absent
in minimal environments. This module is a small fixed-column PDB-format
parser producing duck-typed residues compatible with the Biopython calls
the pipeline actually makes (``res.get_id()``, ``res["CA"].get_coord()``,
``"O" in res``), so `data/preprocessing.py` runs with either engine.

Scope (documented, deliberate): PDB format only (mmCIF still requires
Biopython), first MODEL only, highest-priority altloc kept, ATOM records
plus HETATM MSE (selenomethionine, universally treated as MET).
"""

from __future__ import annotations

import dataclasses
import gzip

import numpy as np

THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
    "MSE": "M",
}


@dataclasses.dataclass
class NativeAtom:
    name: str
    coord: np.ndarray
    element: str
    altloc: str

    def get_coord(self) -> np.ndarray:
        return self.coord


@dataclasses.dataclass
class NativeResidue:
    """Duck-types the Biopython Residue surface used by preprocessing."""

    resname: str
    seq_num: int
    icode: str
    atoms: dict  # name -> NativeAtom

    def get_id(self):
        # Biopython id tuple (hetflag, resseq, icode); icode ' ' when empty
        return (" ", self.seq_num, self.icode if self.icode else " ")

    def __getitem__(self, atom_name: str) -> NativeAtom:
        return self.atoms[atom_name]

    def __contains__(self, atom_name: str) -> bool:
        return atom_name in self.atoms

    @property
    def one_letter(self) -> str:
        return THREE_TO_ONE.get(self.resname, "X")

    @property
    def full_id_str(self) -> str:
        return (str(self.seq_num) + self.icode).strip()


def _parse_atom_line(line: str):
    name = line[12:16].strip()
    altloc = line[16].strip()
    resname = line[17:20].strip()
    chain_id = line[21]
    seq_num = int(line[22:26])
    icode = line[26].strip()
    coord = np.array([float(line[30:38]), float(line[38:46]),
                      float(line[46:54])], dtype=np.float64)
    element = line[76:78].strip() if len(line) >= 78 else ""
    if not element:
        element = name[:1]
    return chain_id, resname, seq_num, icode, name, altloc, coord, element


def parse_pdb_chains(path: str) -> dict:
    """Parse a .pdb (or .pdb.gz) file -> {chain_id: [NativeResidue]} in
    file order. First MODEL only; for duplicate (atom, residue) entries
    the first altloc wins (Biopython's default keeps 'A'/blank, which
    comes first in well-formed files)."""
    opener = gzip.open if path.endswith(".gz") else open
    chains: dict = {}
    index: dict = {}
    with opener(path, "rt") as f:
        for line in f:
            rec = line[:6]
            if rec == "ENDMDL":
                break  # first model only
            is_atom = rec == "ATOM  "
            is_mse = rec == "HETATM" and line[17:20] == "MSE"
            if not (is_atom or is_mse):
                continue
            (chain_id, resname, seq_num, icode, name, altloc, coord,
             element) = _parse_atom_line(line)
            key = (chain_id, seq_num, icode, resname)
            res = index.get(key)
            if res is None:
                res = NativeResidue(resname, seq_num, icode, {})
                index[key] = res
                chains.setdefault(chain_id, []).append(res)
            if name not in res.atoms:  # first altloc wins
                res.atoms[name] = NativeAtom(name, coord, element, altloc)
    return chains
