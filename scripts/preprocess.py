"""BioLiP preprocessing CLI — equivalent of clean_data/data_preprocessing.py.

Two engines (host-side only; see e3diff_tpu/data/preprocessing.py):
* biopython — Biopython parsing + the external dssp binary, exactly the
  reference pipeline (reads .pdb and .cif);
* native — the built-in dependency-free PDB parser + Kabsch-Sander DSSP
  (data/native_structure.py + data/dssp.py; .pdb and .cif).
--engine auto (default) picks biopython when both it and the external
dssp binary are present; otherwise the native engine.

The output pickle feeds every other script via --data_file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_env() -> int:
    """Probe the host for preprocessing deps and report which engine
    resolve_engine('auto') — the pipeline's actual selector — will run.
    Returns a shell exit code so CI / setup scripts can gate on it."""
    from e3diff_tpu.data.preprocessing import (
        find_dssp_binary, has_biopython, resolve_engine)

    probes = []
    if has_biopython():
        import Bio
        probes.append(("biopython", True, getattr(Bio, "__version__", "?")))
    else:
        probes.append(("biopython", False, "No module named 'Bio'"))
    dssp = find_dssp_binary()
    probes.append(("dssp binary", bool(dssp), dssp or "not on PATH"))
    try:
        import pandas
        probes.append(("pandas", True, pandas.__version__))
    except ImportError as e:
        probes.append(("pandas", False, str(e)))

    for name, present, detail in probes:
        print(f"{'ok  ' if present else 'MISS'} {name}: {detail}")

    if not probes[-1][1]:
        print("\npreprocessing cannot run here (pandas missing). Produce "
              "biolip.pt on a host with the deps (see README 'Real "
              "data') and convert it with scripts/convert_data.py.")
        return 1
    engine = resolve_engine("auto")
    if engine == "biopython":
        print("\nengine=auto will use biopython + the external dssp "
              "binary (reference-exact, .pdb + .cif).")
    else:
        print("\nengine=auto will use the built-in native engine "
              "(pure-numpy PDB/mmCIF parser + Kabsch-Sander DSSP with "
              "C++ hot loops; see e3diff_tpu/data/dssp.py for documented "
              "deviations from the external dssp binary).")
    return 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--check-env", action="store_true",
                        help="probe deps, report the engine, and exit")
    parser.add_argument("--meta_file",
                        help="BioLiP metadata TSV (BioLiP.txt)")
    parser.add_argument("--structure_folder",
                        help="folder of {pdb_id}.pdb / {pdb_id}.cif files")
    parser.add_argument("--output", default="./data/biolip.pkl")
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "biopython", "native"])
    args = parser.parse_args()

    if args.check_env:
        raise SystemExit(check_env())
    if not args.meta_file or not args.structure_folder:
        parser.error("--meta_file and --structure_folder are required "
                     "(or use --check-env)")

    from e3diff_tpu.data.preprocessing import run_preprocessing

    records = run_preprocessing(args.meta_file, args.structure_folder,
                                args.output, workers=args.workers,
                                engine=args.engine)
    print(f"wrote {len(records)} complexes to {args.output}")


if __name__ == "__main__":
    main()
