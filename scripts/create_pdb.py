"""Reconstruct PDB files from sampled angles — CLI equivalent of
structure_model/create_pdb.py.

Reads the pickle written by scripts/sample_structure.py. Trajectory-shaped
samples (T, len, 8) use the FINAL step by default (--traj_index overrides;
the reference's load_sampled_angle_seq oddly indexes [0] treating the list
as trajectory-major — pass --reference_indexing to replicate that).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default="./data/output.pkl")
    parser.add_argument("--outdir", default="./data/output")
    parser.add_argument("--traj_index", type=int, default=-1,
                        help="which trajectory step to reconstruct")
    parser.add_argument("--reference_indexing", action="store_true",
                        help="replicate load_sampled_angle_seq's "
                             "result[0] indexing (create_pdb.py:423-427)")
    args = parser.parse_args()

    from e3diff_tpu.geometry import write_pdb_folder

    with open(args.input, "rb") as f:
        sampled = pickle.load(f)

    if args.reference_indexing:
        sampled = sampled[0]

    frames = []
    for s in sampled:
        s = np.asarray(s)
        frames.append(s[args.traj_index] if s.ndim == 3 else s)

    written = write_pdb_folder(frames, args.outdir)
    ok = [w for w in written if w]
    print(f"wrote {len(ok)}/{len(written)} PDBs to {args.outdir}")


if __name__ == "__main__":
    main()
