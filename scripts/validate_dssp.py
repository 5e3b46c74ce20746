"""Cross-environment DSSP parity kit: native engine vs biopython+mkdssp.

The native preprocessing engine (e3diff_tpu/data/{native_structure,dssp}.py)
replicates what the reference pipeline gets from Biopython's DSSP wrapper
around the external mkdssp binary (clean_data/data_preprocessing.py:746-769).
mkdssp cannot run in the build environment, so this script is the kit to
carry INTO any environment that has biopython + mkdssp installed: it runs
both engines over a folder of structures, diffs them record-for-record
(residue coverage, amino acid, 8-class secondary structure, relative ASA,
H-bond partners/energies), and writes a JSON parity report.

Usage:
    python scripts/validate_dssp.py --structure_folder pdbs/ \
        [--meta_file BioLiP.tsv] [--limit 100] [--out dssp_parity.json]

Exit codes: 0 = both engines ran and the report was written;
2 = biopython or the mkdssp binary is missing (nothing to validate
against); 1 = structural disagreement (residue sets/amino acids differ —
an alignment bug, worse than an SS/ASA deviation).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare_structure(path):
    """Run both engines on one structure file; return a per-file report
    dict (or raise on parse failure)."""
    from Bio.PDB import MMCIFParser, PDBParser

    from e3diff_tpu.data.dssp import native_dssp_features
    from e3diff_tpu.data.native_structure import parse_structure_chains
    from e3diff_tpu.data.preprocessing import extract_dssp_features

    # Bio.PDB's parsers and the external dssp binary only read plain
    # text; BioLiP drops ship gzipped — decompress to a temp file for the
    # reference engine (the native parser reads .gz directly)
    work_path, tmp = path, None
    if path.endswith(".gz"):
        import gzip
        import tempfile

        suffix = os.path.splitext(path[:-3])[1] or ".pdb"
        fd, tmp = tempfile.mkstemp(suffix=suffix)
        with os.fdopen(fd, "wb") as f, gzip.open(path, "rb") as g:
            f.write(g.read())
        work_path = tmp
    try:
        parser = (MMCIFParser(QUIET=True)
                  if path.endswith((".cif", ".cif.gz"))
                  else PDBParser(QUIET=True))
        structure = parser.get_structure("87", work_path)[0]
        bio = extract_dssp_features(structure, work_path)
        native = native_dssp_features(parse_structure_chains(path))
    finally:
        if tmp is not None:
            os.unlink(tmp)

    report = {
        "file": os.path.basename(path),
        "chains": {},
        "n_residues": 0,
        "n_aligned": 0,
        "aa_mismatches": 0,
        "ss_mismatches": 0,
        "ss_confusion": {},      # "bio->native" pair counts
        "asa_max_abs_diff": 0.0,
        "hbond_partner_mismatches": 0,
        "hbond_energy_max_abs_diff": 0.0,
    }

    def res_key(feat):
        r = feat["res"]
        rid = r.get_id()
        return (str(rid[1]) + str(rid[2])).strip()

    for chain_id in sorted(set(bio) | set(native)):
        b_feats = {res_key(f): f for f in bio.get(chain_id, [])}
        n_feats = {res_key(f): f for f in native.get(chain_id, [])}
        only_bio = sorted(set(b_feats) - set(n_feats))
        only_native = sorted(set(n_feats) - set(b_feats))
        common = sorted(set(b_feats) & set(n_feats))
        report["chains"][chain_id] = {
            "only_biopython": only_bio, "only_native": only_native,
            "n_common": len(common)}
        report["n_residues"] += len(set(b_feats) | set(n_feats))
        report["n_aligned"] += len(common)
        for rid in common:
            fb, fn = b_feats[rid], n_feats[rid]
            if fb["amino_acid"] != fn["amino_acid"]:
                report["aa_mismatches"] += 1
            if fb["secondary_structure"] != fn["secondary_structure"]:
                report["ss_mismatches"] += 1
                pair = f"{fb['secondary_structure']}->" \
                       f"{fn['secondary_structure']}"
                report["ss_confusion"][pair] = \
                    report["ss_confusion"].get(pair, 0) + 1
            asa_d = abs(float(fb["relative_ASA"]) - float(fn["relative_ASA"]))
            report["asa_max_abs_diff"] = max(report["asa_max_abs_diff"],
                                             asa_d)
            for slot in ("NH_O_1", "O_NH_1", "NH_O_2", "O_NH_2"):
                if fb[f"{slot}_relidx"] != fn[f"{slot}_relidx"]:
                    report["hbond_partner_mismatches"] += 1
                e_d = abs(float(fb[f"{slot}_energy"])
                          - float(fn[f"{slot}_energy"]))
                report["hbond_energy_max_abs_diff"] = max(
                    report["hbond_energy_max_abs_diff"], e_d)
    return report


def structure_files(folder, meta_file=None, limit=None):
    if meta_file:
        import pandas as pd

        from e3diff_tpu.data.preprocessing import BIOLIP_META_HEADER

        meta = pd.read_csv(meta_file, sep="\t", names=BIOLIP_META_HEADER)
        ids = meta["pdb_id"].drop_duplicates().tolist()
        files = []
        for pid in ids:
            for ext in (".pdb", ".cif", ".pdb.gz", ".cif.gz"):
                p = os.path.join(folder, f"{pid}{ext}")
                if os.path.exists(p):
                    files.append(p)
                    break
    else:
        files = sorted(
            glob.glob(os.path.join(folder, "*.pdb"))
            + glob.glob(os.path.join(folder, "*.cif"))
            + glob.glob(os.path.join(folder, "*.pdb.gz"))
            + glob.glob(os.path.join(folder, "*.cif.gz")))
    return files[:limit] if limit else files


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--structure_folder", required=True)
    parser.add_argument("--meta_file", default=None,
                        help="BioLiP TSV: validate exactly the pdb_ids a "
                             "preprocessing run would touch")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--out", default="dssp_parity.json")
    args = parser.parse_args(argv)

    from e3diff_tpu.data.preprocessing import (
        find_dssp_binary,
        has_biopython,
    )

    missing = []
    if not has_biopython():
        missing.append("biopython")
    if find_dssp_binary() is None:
        missing.append("mkdssp/dssp binary")
    if missing:
        print(f"cannot validate here: missing {', '.join(missing)}. "
              "Run this script in an environment with biopython + mkdssp "
              "(e.g. the reference's conda env) against the same "
              "structure folder.")
        return 2

    files = structure_files(args.structure_folder, args.meta_file,
                            args.limit)
    if not files:
        print(f"no structures found in {args.structure_folder}")
        return 2

    per_file, failures = [], []
    for path in files:
        try:
            per_file.append(compare_structure(path))
        except Exception as e:  # keep going, record the failure
            failures.append({"file": os.path.basename(path),
                             "error": str(e)})

    totals = {
        "n_files": len(per_file),
        "n_failures": len(failures),
        "n_residues": sum(r["n_residues"] for r in per_file),
        "n_aligned": sum(r["n_aligned"] for r in per_file),
        "aa_mismatches": sum(r["aa_mismatches"] for r in per_file),
        "ss_mismatches": sum(r["ss_mismatches"] for r in per_file),
        "hbond_partner_mismatches": sum(
            r["hbond_partner_mismatches"] for r in per_file),
        "asa_max_abs_diff": max(
            (r["asa_max_abs_diff"] for r in per_file), default=0.0),
        "hbond_energy_max_abs_diff": max(
            (r["hbond_energy_max_abs_diff"] for r in per_file), default=0.0),
        "ss_confusion": {},
    }
    for r in per_file:
        for pair, c in r["ss_confusion"].items():
            totals["ss_confusion"][pair] = \
                totals["ss_confusion"].get(pair, 0) + c

    with open(args.out, "w") as f:
        json.dump({"totals": totals, "files": per_file,
                   "failures": failures}, f, indent=1, sort_keys=True)

    aligned = max(totals["n_aligned"], 1)
    print(f"{totals['n_files']} files, {totals['n_aligned']}/"
          f"{totals['n_residues']} residues aligned")
    print(f"SS agreement: {1 - totals['ss_mismatches'] / aligned:.4f}  "
          f"(mismatches by class: {totals['ss_confusion']})")
    print(f"ASA max |diff|: {totals['asa_max_abs_diff']:.4f}; H-bond "
          f"energy max |diff|: {totals['hbond_energy_max_abs_diff']:.3f}; "
          f"partner mismatches: {totals['hbond_partner_mismatches']}")
    print(f"report written to {args.out}")

    if totals["n_aligned"] == 0:
        # nothing compared (every file failed, or the folder matched no
        # parseable structures) — exit 0 here would read as "validated"
        print("NO residues were compared "
              f"({len(failures)} failures) — parity NOT validated.")
        return 2
    if totals["aa_mismatches"] or totals["n_aligned"] < totals["n_residues"]:
        print("STRUCTURAL disagreement (residue sets or amino acids "
              "differ) — investigate before trusting either engine.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
