"""Sample backbone angles with the structure DDPM — CLI equivalent of
structure_model/sample.py. Writes the trajectory pickle consumed by
scripts/create_pdb.py and scripts/sample_by_generated_angles.py.

Example:
    python scripts/sample_structure.py --data_file data/biolip.pt \
        --ckpt runs/structure/final --output data/output.pkl
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
    structure_sample_config,
)


def load_params(ckpt_path: str, model, sample_batch, rng,
                params_dtype=None):
    """Restore params from an orbax checkpoint dir ('final' or train-state),
    or convert a torch state_dict (.pt) via the porting utilities."""
    from e3diff_tpu.utils.params_io import load_structure_params

    return load_structure_params(ckpt_path, model, sample_batch, rng,
                                 params_dtype=params_dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output", default="./data/output.pkl")
    parser.add_argument("--step", type=int, default=1,
                        help="stride through timesteps (reference STEP knob; "
                             "a lossy skip — prefer --sampler ddim)")
    parser.add_argument("--sampler", choices=["ddpm", "ddim"],
                        default="ddpm",
                        help="ddpm = reference-faithful ancestral loop; "
                             "ddim = accelerated subsequence sampler "
                             "(--ddim_steps forwards instead of T)")
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="classifier-free guidance scale on the "
                             "epsilon prediction (1 = off; needs a "
                             "--cond_dropout-trained checkpoint)")
    parser.add_argument("--ddim_eta", type=float, default=1.0,
                        help="1.0 (default) matches DDPM quality at 20x fewer steps on the wrapped-angle domain (BENCHMARKS.md); 0.0 = deterministic, measured worse here")
    parser.add_argument("--all_batches", action="store_true",
                        help="disable the reference's first-batch-only "
                             "quirk (Q5)")
    parser.add_argument("--no_trajectory", action="store_true",
                        help="keep only the final sample per peptide")
    parser.add_argument("--trajectory_bf16", action="store_true",
                        help="store/pull the trajectory in bfloat16 (halves "
                             "the device->host transfer, which exceeds the "
                             "sampling compute itself on tunneled TPUs)")
    parser.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default="f32",
                        help="load-time parameter storage dtype. bf16 "
                             "halves the sampler's dominant HBM weight "
                             "stream (the step is bandwidth-bound, "
                             "BENCHMARKS.md); training params stay f32")
    parser.add_argument("--synthetic", action="store_true")
    add_config_flags(parser, structure_sample_config())
    args = parser.parse_args()
    if not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    cfg, _ = adopt_ckpt_config(cfg, parser, args.ckpt)


    import jax

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.sampling import sample_structure_batches
    from e3diff_tpu.utils.builders import (
        build_structure_diffusion,
        build_structure_model,
    )

    complexes = (synthetic_complexes(n=32) if args.synthetic
                 else load_complexes(args.data_file))
    test_ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                    cfg.pocket_ext, cfg.ligand_max_len)
    print(f"test={len(test_ds)} complexes")

    model = build_structure_model(cfg)
    diffusion = build_structure_diffusion(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    sample_batch = next(test_ds.batches(cfg.batch_size))
    params = load_params(args.ckpt, model, sample_batch, rng,
                         params_dtype=args.params_dtype)

    import jax.numpy as jnp

    results = sample_structure_batches(
        params, model, diffusion, test_ds.batches(cfg.batch_size), rng,
        step=args.step, first_batch_only=not args.all_batches,
        return_trajectory=not args.no_trajectory,
        trajectory_dtype=jnp.bfloat16 if args.trajectory_bf16 else None,
        sampler=args.sampler, ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta, guidance_scale=args.guidance_scale)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(results, f)
    print(f"wrote {len(results)} samples to {args.output}")


if __name__ == "__main__":
    main()
