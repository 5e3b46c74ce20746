"""Evaluate sampled outputs against the dataset's ground truth.

Inputs: the pickle from scripts/sample_structure.py (angles) and/or
scripts/sample_sequence.py (sequences). Prints recovery-rate statistics,
per-feature wrapped-angle error, and distribution TV distances.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e3diff_tpu.utils.presets import (  # noqa: E402
    add_config_flags,
    adopt_ckpt_config,
    config_from_args,
    structure_sample_config,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--angles", help="sampled angles pickle")
    parser.add_argument("--sequences", help="sequence results pickle")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_n", type=int, default=32)
    parser.add_argument("--geometry", action="store_true",
                        help="also NERF-reconstruct each sample and report "
                             "3D validity: steric clash fraction, "
                             "clash-free share, radius of gyration")
    parser.add_argument("--config", default=None,
                        help="run dir (or its config.json) whose data "
                             "fields to adopt, so ground truth is built "
                             "with the same pocket_ext/max_seq_len the "
                             "samples came from")
    add_config_flags(parser, structure_sample_config())
    args = parser.parse_args()
    if not args.angles and not args.sequences:
        parser.error("pass --angles and/or --sequences")
    # sequences-only evaluation never touches ground truth: the record
    # pickle already carries per-sample recovery rates
    needs_data = bool(args.angles)
    if needs_data and not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    if args.config:
        cfg, _ = adopt_ckpt_config(cfg, parser, args.config)

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.utils.evaluation import (
        geometry_summary,
        mean_wrapped_angle_error,
        summarize_samples,
    )

    if args.angles:
        complexes = (synthetic_complexes(n=args.synthetic_n)
                     if args.synthetic else load_complexes(args.data_file))
        test_ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                        cfg.pocket_ext, cfg.ligand_max_len)
        examples = [test_ds[i] for i in range(len(test_ds))]
        truth = [ex["ligand_angles"][:ex["ligand_length"]]
                 for ex in examples]
        with open(args.angles, "rb") as f:
            sampled = pickle.load(f)
        sampled = [np.asarray(s)[-1] if np.asarray(s).ndim == 3
                   else np.asarray(s) for s in sampled]
        summary = summarize_samples(sampled, truth[:len(sampled)])
        print("angle distribution TV distance per feature:")
        for k, v in summary["tv_distance"].items():
            print(f"  {k:10s} {v:.4f}")
        print(f"mean TV distance: {summary['tv_distance_mean']:.4f}")
        print(f"joint (phi,psi) TV distance: "
              f"{summary['joint_tv_phi_psi']:.4f}")
        if args.geometry:
            for label, sets in (("sampled", sampled),
                                ("reference", truth[:len(sampled)])):
                g = geometry_summary(sets)
                print(f"{label} backbone geometry (NERF-reconstructed): "
                      f"clash_fraction={g['clash_fraction_mean']:.4f} "
                      f"clash_free={g['clash_free_structures']:.2%} "
                      f"Rg={g['rg_mean']:.2f}±{g['rg_std']:.2f} Å "
                      f"nan={g['n_nan_reconstructions']}"
                      f"/{g['n_structures']}")
        paired = [(s, t) for s, t in zip(sampled, truth) if len(s) == len(t)]
        if paired:
            errs = np.stack([mean_wrapped_angle_error(t, s)
                             for s, t in paired])
            print("mean wrapped-angle error (fraction of turn) per feature:")
            print("  " + " ".join(f"{e:.4f}" for e in errs.mean(0)))

    if args.sequences:
        with open(args.sequences, "rb") as f:
            res = pickle.load(f)
        rates = np.asarray(res["recovery_rate"])
        print(f"sequences: n={len(rates)} recovery mean={rates.mean():.4f} "
              f"median={np.median(rates):.4f} max={rates.max():.4f}")


if __name__ == "__main__":
    main()
