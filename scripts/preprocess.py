"""BioLiP preprocessing CLI — equivalent of clean_data/data_preprocessing.py.

Needs biopython + a dssp binary (host-side only; see
e3diff_tpu/data/preprocessing.py). The output pickle feeds every other
script via --data_file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_env() -> int:
    """Probe the host for the external preprocessing deps (biopython, a dssp
    binary, pandas) and report what's missing. Returns a shell exit code so
    CI / setup scripts can gate on it."""
    import shutil

    probes = []
    try:
        import Bio  # noqa: F401
        from Bio.PDB import PDBParser, MMCIFParser  # noqa: F401
        probes.append(("biopython", True, getattr(Bio, "__version__", "?")))
    except ImportError as e:
        probes.append(("biopython", False, str(e)))
    dssp = shutil.which("mkdssp") or shutil.which("dssp")
    probes.append(("dssp binary", bool(dssp), dssp or "not on PATH"))
    try:
        import pandas  # noqa: F401
        probes.append(("pandas", True, pandas.__version__))
    except ImportError as e:
        probes.append(("pandas", False, str(e)))

    ok = True
    for name, present, detail in probes:
        print(f"{'ok  ' if present else 'MISS'} {name}: {detail}")
        ok = ok and present
    if not ok:
        print("\npreprocessing cannot run here. Produce biolip.pt on a host "
              "with the deps (see README 'Real data') and convert it with "
              "scripts/convert_data.py; every CLI then takes the converted "
              "file via --data_file.")
    return 0 if ok else 1


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--check-env", action="store_true",
                        help="probe for biopython/dssp/pandas and exit")
    parser.add_argument("--meta_file",
                        help="BioLiP metadata TSV (BioLiP.txt)")
    parser.add_argument("--structure_folder",
                        help="folder of {pdb_id}.pdb / {pdb_id}.cif files")
    parser.add_argument("--output", default="./data/biolip.pkl")
    parser.add_argument("--workers", type=int, default=16)
    args = parser.parse_args()

    if args.check_env:
        raise SystemExit(check_env())
    if not args.meta_file or not args.structure_folder:
        parser.error("--meta_file and --structure_folder are required "
                     "(or use --check-env)")

    from e3diff_tpu.data.preprocessing import run_preprocessing

    records = run_preprocessing(args.meta_file, args.structure_folder,
                                args.output, workers=args.workers)
    print(f"wrote {len(records)} complexes to {args.output}")


if __name__ == "__main__":
    main()
