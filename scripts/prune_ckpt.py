"""Prune heavyweight checkpoint artifacts from a finished run dir.

The resumable 'last' checkpoint carries the FULL train state (params +
AdamW moments — ~2.3 GB for the 146M model), which only matters while
the run can still resume. After training, the inference artifacts
(final / best_val_model / final_ema, params-only) are all the sampling
CLIs and the serving engine need. This removes the rest; config.json is
always kept (reconcile_run_config protects pruned dirs against
conflicting retrains).

Example:
    python scripts/prune_ckpt.py runs/structure            # drop 'last'
    python scripts/prune_ckpt.py runs/structure --keep final
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INFERENCE_ARTIFACTS = ("final", "best_val_model", "final_ema")


def dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def prune(run_dir: str, keep: tuple, dry_run: bool = False) -> int:
    """Remove checkpoint dirs not in `keep`; returns bytes freed."""
    freed = 0
    for name in sorted(os.listdir(run_dir)):
        path = os.path.join(run_dir, name)
        if not os.path.isdir(path):
            continue  # config.json / history.json always survive
        if name in keep:
            continue
        # only touch things that look like checkpoints (orbax dirs or
        # the in-flight .tmp a preempted save leaves behind)
        is_ckpt = (name in ("last",) + INFERENCE_ARTIFACTS
                   or name.endswith(".tmp")
                   or os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
                   or os.path.exists(os.path.join(path, "checkpoint")))
        if not is_ckpt:
            continue
        size = dir_size(path)
        print(f"{'would remove' if dry_run else 'removing'} "
              f"{path} ({size / 1e6:.1f} MB)")
        if not dry_run:
            shutil.rmtree(path)
        freed += size
    return freed


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir")
    parser.add_argument("--keep", default=",".join(INFERENCE_ARTIFACTS),
                        help="comma list of checkpoint names to keep "
                             "(default: the params-only inference "
                             "artifacts)")
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()
    keep = tuple(k for k in args.keep.split(",") if k)
    kept = [k for k in keep if os.path.isdir(os.path.join(args.run_dir, k))]
    if not kept:
        raise SystemExit(
            f"refusing to prune {args.run_dir}: none of {keep} exists "
            "there — pruning would leave NO usable weights")
    freed = prune(args.run_dir, keep, dry_run=args.dry_run)
    print(f"{'would free' if args.dry_run else 'freed'} "
          f"{freed / 1e6:.1f} MB; kept {kept} + config/history")


if __name__ == "__main__":
    main()
