"""BioLiP preprocessing CLI — equivalent of clean_data/data_preprocessing.py.

Needs biopython + a dssp binary (host-side only; see
e3diff_tpu/data/preprocessing.py). The output pickle feeds every other
script via --data_file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--meta_file", required=True,
                        help="BioLiP metadata TSV (BioLiP.txt)")
    parser.add_argument("--structure_folder", required=True,
                        help="folder of {pdb_id}.pdb / {pdb_id}.cif files")
    parser.add_argument("--output", default="./data/biolip.pkl")
    parser.add_argument("--workers", type=int, default=16)
    args = parser.parse_args()

    from e3diff_tpu.data.preprocessing import run_preprocessing

    records = run_preprocessing(args.meta_file, args.structure_folder,
                                args.output, workers=args.workers)
    print(f"wrote {len(records)} complexes to {args.output}")


if __name__ == "__main__":
    main()
