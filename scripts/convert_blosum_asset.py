"""One-time conversion of the reference BLOSUM asset to .npz.

Reads the published tensor asset (sequence_model/blosum_substitute.pt:
original_score [20,20], Qtb_temperature [500], Qt_temperature [500]) and
writes assets/blosum_substitute.npz. Torch is only needed for this script,
never at framework runtime.
"""

import hashlib
import os
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/sequence_model/blosum_substitute.pt"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "blosum_substitute.npz")


def main():
    import torch

    d = torch.load(SRC, map_location="cpu")
    arrays = {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}
    assert arrays["original_score"].shape == (20, 20)
    assert arrays["Qtb_temperature"].shape == (500,)
    assert arrays["Qt_temperature"].shape == (500,)
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    np.savez(DST, **arrays)
    digest = hashlib.sha256(open(DST, "rb").read()).hexdigest()
    print(f"wrote {DST}\nsha256 {digest}")
    for k, v in arrays.items():
        print(k, v.shape, v.dtype, float(v.min()), float(v.max()))


if __name__ == "__main__":
    main()
