"""Inverse-fold test complexes with the sequence D3PM — CLI equivalent of
sequence_model/sample.py (BLOSUM transition, native backbone angles).

Example:
    python scripts/sample_sequence.py --data_file data/biolip.pt \
        --ckpt runs/sequence/final --output data/seq_output.pkl
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e3diff_tpu.utils.presets import (  # noqa: E402
    add_config_flags,
    adopt_ckpt_config,
    config_from_args,
    sequence_sample_config,
)


def load_params(ckpt_path: str, model, sample_batch, rng,
                params_dtype=None):
    from e3diff_tpu.utils.params_io import load_sequence_params

    return load_sequence_params(ckpt_path, model, sample_batch, rng,
                                params_dtype=params_dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output", default="./data/seq_output.pkl")
    parser.add_argument("--transition", default="blosum",
                        choices=["blosum", "uniform"])
    parser.add_argument("--greedy", action="store_true",
                        help="argmax instead of categorical (diverse) draws")
    parser.add_argument("--skip_steps", type=int, default=None,
                        help="run the D3PM reverse loop over N evenly "
                             "spaced steps instead of all T (discrete "
                             "skip sampling; not in the reference)")
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="classifier-free guidance scale on the "
                             "logits (1 = off; needs a --cond_dropout-"
                             "trained checkpoint)")
    parser.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default="f32",
                        help="load-time parameter storage dtype (bf16 "
                             "halves the HBM weight stream; inference "
                             "only)")
    parser.add_argument("--synthetic", action="store_true")
    add_config_flags(parser, sequence_sample_config())
    args = parser.parse_args()
    if not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    cfg, _ = adopt_ckpt_config(cfg, parser, args.ckpt)


    import jax
    import numpy as np

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.sampling import sample_sequence_batches
    from e3diff_tpu.utils.builders import (
        build_sequence_diffusion,
        build_sequence_model,
    )

    complexes = (synthetic_complexes(n=32) if args.synthetic
                 else load_complexes(args.data_file))
    test_ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                    cfg.pocket_ext, cfg.ligand_max_len)
    print(f"test={len(test_ds)} complexes")

    model = build_sequence_model(cfg)
    d3pm = build_sequence_diffusion(cfg, transition=args.transition)
    rng = jax.random.PRNGKey(cfg.seed)
    sample_batch = next(test_ds.batches(cfg.batch_size))
    params = load_params(args.ckpt, model, sample_batch, rng,
                         params_dtype=args.params_dtype)

    results = sample_sequence_batches(
        params, model, d3pm, test_ds.batches(cfg.batch_size), rng,
        diverse=not args.greedy, n_steps=args.skip_steps,
        guidance_scale=args.guidance_scale)
    print(f"mean recovery rate: {np.mean(results['recovery_rate']):.4f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(results, f)
    print(f"wrote {len(results['recovery_rate'])} results to {args.output}")


if __name__ == "__main__":
    main()
