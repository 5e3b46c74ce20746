"""Measure classifier-free guidance quality across guidance scales.

Corpus: `native_data_demo.py --couple_ligand` ties the ligand's basin
mix to the receptor's helix content (lig_bias = 0.15 + 0.7 * rec_bias),
so the pocket conditioning carries a learnable per-complex signal that
CFG can strengthen — on the independent-ligand corpora every complex
shares one answer (the global marginal) and guidance has nothing to
sharpen. Train both models with --cond_dropout first; then this script
sweeps w over the SAME compiled program per model (the scale is a traced
scalar of the guided sampler).

Metrics per scale w:
  structure — Pearson r across test complexes between the sampled and
    true per-complex helix fractions (phi/psi in the alpha basin): how
    much of the pocket-implied signal the sampler actually uses. Plus
    mean marginal TV vs the test set (over-sharpening detector: w too
    large narrows marginals and TV rises).
  sequence — mean residue recovery on true angles (basin-linked AA
    preferences make recovery the conditional metric), vs 5% chance.

Usage:
  python experiments/r3_cfg.py --data_file /tmp/cfg_corpus/complexes.pkl \
    --structure_ckpt /tmp/cfg_runs/structure/final \
    --sequence_ckpt /tmp/cfg_runs/sequence/final \
    --scales 0,0.5,1,1.5,2,3 --out experiments/r3_results.jsonl
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e3diff_tpu.utils import compile_cache  # noqa: E402

# alpha-basin window around the demo corpus's helix center (-63, -43)
# with sigma ~12 deg jitter; wide enough to catch the basin, narrow
# enough to exclude beta (-120, 130) and ppII (-75, 150)
PHI_WIN = (np.deg2rad(-110.0), np.deg2rad(-20.0))
PSI_WIN = (np.deg2rad(-90.0), np.deg2rad(10.0))


def helix_fraction(angles: np.ndarray) -> float:
    """Fraction of residues in the alpha basin; angles (L, 8) wrapped.

    Quirk Q1: the stored column order is [omega, phi, psi, ...] despite
    the dataset's ["phi","psi","omega",...] labels — physical phi/psi
    are columns 1/2."""
    phi, psi = angles[:, 1], angles[:, 2]
    in_a = ((phi > PHI_WIN[0]) & (phi < PHI_WIN[1])
            & (psi > PSI_WIN[0]) & (psi < PSI_WIN[1]))
    return float(in_a.mean()) if len(in_a) else 0.0


def cfg_from_sidecar(ckpt: str):
    from e3diff_tpu.utils.presets import (
        load_ckpt_config, structure_sample_config)
    side = load_ckpt_config(ckpt)
    if side is None:
        raise SystemExit(f"no config.json sidecar next to {ckpt}")
    base = structure_sample_config()
    known = {f.name for f in dataclasses.fields(base)}
    return dataclasses.replace(
        base, **{k: v for k, v in side.items() if k in known})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_file", required=True)
    ap.add_argument("--structure_ckpt")
    ap.add_argument("--sequence_ckpt")
    ap.add_argument("--scales", default="0,0.5,1,1.5,2,3")
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--seq_steps", type=int, default=None,
                    help="D3PM skip steps (None = all T)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "r3_results.jsonl"))
    ap.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                    default="f32",
                    help="inference parameter storage dtype (the r4 "
                         "quality pin for --params_dtype bf16)")
    ap.add_argument("--tag", default="r3_cfg",
                    help="exp-name prefix in the results jsonl")
    args = ap.parse_args()
    scales = [float(s) for s in args.scales.split(",")]
    pdt = None if args.params_dtype == "f32" else args.params_dtype

    compile_cache.enable_persistent_compilation_cache()
    import jax

    from e3diff_tpu.data import LigandBindingSiteData
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.utils.builders import (
        build_sequence_diffusion, build_sequence_model,
        build_structure_diffusion, build_structure_model)

    complexes = load_complexes(args.data_file)
    results = []

    if args.structure_ckpt:
        from e3diff_tpu.sampling import sample_structure_batches
        from e3diff_tpu.utils.evaluation import histogram_distance
        from e3diff_tpu.utils.params_io import load_structure_params

        cfg = cfg_from_sidecar(args.structure_ckpt)
        ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                   cfg.pocket_ext, cfg.ligand_max_len)
        model = build_structure_model(cfg)
        diffusion = build_structure_diffusion(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        params = load_structure_params(
            args.structure_ckpt, model, next(ds.batches(cfg.batch_size)),
            rng, params_dtype=pdt)

        # ground truth per complex (unpadded lengths via attn mask)
        true_angles, true_helix = [], []
        for batch in ds.batches(cfg.batch_size):
            ang = np.asarray(batch["ligand_angles"])
            msk = np.asarray(batch["ligand_attn_mask"]).astype(bool)
            for i in range(int(batch["num_valid"])):
                a = ang[i][msk[i]]
                true_angles.append(a)
                true_helix.append(helix_fraction(a))
        true_flat = np.concatenate(true_angles, 0)

        for w in scales:
            t0 = time.time()
            samples = sample_structure_batches(
                params, model, diffusion, ds.batches(cfg.batch_size),
                jax.random.PRNGKey(1234), first_batch_only=False,
                return_trajectory=False, sampler="ddim",
                ddim_steps=args.ddim_steps, guidance_scale=w)
            helix = [helix_fraction(s) for s in samples]
            flat = np.concatenate(samples, 0)
            tv = histogram_distance(true_flat, flat)
            r = float(np.corrcoef(true_helix, helix)[0, 1])
            # bimodal-corpus class metric: each complex is helix-rich or
            # strand-rich (couple_mode=bimodal); the sampler's per-complex
            # class call vs the true ligand's — a far less noisy
            # conditional-signal readout than helix_corr on 5-14-residue
            # peptides (threshold = midpoint of the true class means)
            th = np.asarray(true_helix)
            thr = (th[th >= np.median(th)].mean()
                   + th[th < np.median(th)].mean()) / 2.0
            pred_cls = np.asarray(helix) > thr
            true_cls = th > thr
            cls_acc = float((pred_cls == true_cls).mean())
            rec = {"exp": f"{args.tag}_structure", "scale": w,
                   "n_test": len(samples),
                   "params_dtype": args.params_dtype,
                   "helix_corr": round(r, 4),
                   "class_acc": round(cls_acc, 4),
                   "class_threshold": round(float(thr), 4),
                   "helix_frac_mean": round(float(np.mean(helix)), 4),
                   "helix_frac_true_mean":
                       round(float(np.mean(true_helix)), 4),
                   "mean_marginal_tv": round(float(np.mean(tv)), 4),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            results.append(rec)

    if args.sequence_ckpt:
        from e3diff_tpu.sampling import sample_sequence_batches
        from e3diff_tpu.utils.params_io import load_sequence_params

        cfg = cfg_from_sidecar(args.sequence_ckpt)
        ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                   cfg.pocket_ext, cfg.ligand_max_len)
        model = build_sequence_model(cfg)
        d3pm = build_sequence_diffusion(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        params = load_sequence_params(
            args.sequence_ckpt, model, next(ds.batches(cfg.batch_size)),
            rng, params_dtype=pdt)

        # per-class split (r5): the corpus couples residue preferences to
        # the receptor's secondary-structure class (helix-rich vs
        # strand-rich), so recovery conditioned on the TRUE receptor
        # class shows whether the model uses the pocket signal per class
        # or just the global marginal
        rec_helix = []
        for i in range(len(ds)):
            s = ds[i]
            m = np.asarray(s["receptor_attn_mask"]).astype(bool)
            rec_helix.append(
                helix_fraction(np.asarray(s["receptor_angles"])[m]))
        rec_helix = np.asarray(rec_helix)
        cls_thr = float(np.median(rec_helix))
        helix_cls = rec_helix > cls_thr

        for w in scales:
            t0 = time.time()
            out = sample_sequence_batches(
                params, model, d3pm, ds.batches(cfg.batch_size),
                jax.random.PRNGKey(1234), diverse=True,
                n_steps=args.seq_steps, guidance_scale=w)
            rr = np.asarray(out["recovery_rate"])
            cls = helix_cls[:len(rr)]
            rec = {"exp": f"{args.tag}_sequence", "scale": w,
                   "n_test": len(out["recovery_rate"]),
                   "params_dtype": args.params_dtype,
                   "recovery_mean":
                       round(float(np.mean(out["recovery_rate"])), 4),
                   "recovery_helix_class":
                       round(float(rr[cls].mean()), 4) if cls.any() else None,
                   "recovery_strand_class":
                       round(float(rr[~cls].mean()), 4)
                       if (~cls).any() else None,
                   "class_threshold": round(cls_thr, 4),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            results.append(rec)

    with open(args.out, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
