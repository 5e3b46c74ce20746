"""Inverse-fold with GENERATED backbone angles — CLI equivalent of
sequence_model/sample_by_generated_angles.py (the end-to-end pipeline
tail: uniform transition, ligand angles from scripts/sample_structure.py
output).

Example:
    python scripts/sample_by_generated_angles.py --data_file data/biolip.pt \
        --ckpt runs/sequence/final --generated data/output.pkl
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
    sequence_sample_config,
)
from scripts.sample_sequence import load_params  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--generated", default="./data/output.pkl")
    parser.add_argument("--output",
                        default="./data/from_generated_angles/output.pkl")
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default="f32",
                        help="load-time parameter storage dtype (bf16 "
                             "halves the HBM weight stream)")
    parser.add_argument("--synthetic", action="store_true")
    add_config_flags(parser, sequence_sample_config())
    args = parser.parse_args()
    if not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    cfg, _ = adopt_ckpt_config(cfg, parser, args.ckpt)


    import jax

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.sampling import sample_sequence_batches
    from e3diff_tpu.sampling.pipeline import _pad_generated
    from e3diff_tpu.utils.builders import (
        build_sequence_diffusion,
        build_sequence_model,
    )

    complexes = (synthetic_complexes(n=32) if args.synthetic
                 else load_complexes(args.data_file))
    test_ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                    cfg.pocket_ext, cfg.ligand_max_len)

    with open(args.generated, "rb") as f:
        generated = pickle.load(f)
    # trajectory-shaped samples -> final step
    generated = [np.asarray(g)[-1] if np.asarray(g).ndim == 3
                 else np.asarray(g) for g in generated]

    batches = list(test_ds.batches(cfg.batch_size))
    n_needed = sum(int(b["num_valid"]) for b in batches)
    if len(generated) < n_needed:
        # keep enough batches to cover every generated sample and clamp
        # the last one's num_valid to the remainder (its uncovered slots
        # get zero-padded angles in _pad_generated and drop out of the
        # results like any padded slot)
        keep = max(1, -(-len(generated) // cfg.batch_size))
        batches = batches[:keep]
        covered = 0
        for b in batches:
            valid = min(int(b["num_valid"]), len(generated) - covered)
            b["num_valid"] = np.int32(valid)
            covered += valid
        print(f"only {len(generated)} generated samples; restricting to "
              f"{len(batches)} batches ({covered} designs)")
    gen_batches = _pad_generated(generated, test_ds.ligand_max_len, batches)

    model = build_sequence_model(cfg)
    d3pm = build_sequence_diffusion(cfg, transition="uniform")
    rng = jax.random.PRNGKey(cfg.seed)
    params = load_params(args.ckpt, model, batches[0], rng,
                         params_dtype=args.params_dtype)

    results = sample_sequence_batches(
        params, model, d3pm, batches, rng,
        diverse=not args.greedy, generated_angles=gen_batches)
    print(f"mean recovery rate: {np.mean(results['recovery_rate']):.4f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(results, f)
    print(f"wrote {len(results['recovery_rate'])} results to {args.output}")


if __name__ == "__main__":
    main()
