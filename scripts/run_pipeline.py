"""End-to-end pipeline CLI: sample angles -> NERF PDBs -> inverse fold.

The reference's full flow (structure sample -> create_pdb ->
sample_by_generated_angles) as one command.
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
    load_ckpt_config,
    structure_sample_config,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--structure_ckpt", required=True)
    parser.add_argument("--sequence_ckpt", required=True)
    parser.add_argument("--outdir", default="./data/pipeline")
    parser.add_argument("--sampler", choices=["ddpm", "ddim"],
                        default="ddpm",
                        help="structure sampler: ddpm = faithful 1000-step loop; ddim = accelerated (--ddim_steps forwards)")
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--ddim_eta", type=float, default=1.0)
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="CFG scale for the structure sampler "
                             "(1 = off; needs a --cond_dropout-trained "
                             "checkpoint)")
    parser.add_argument("--sequence_guidance_scale", type=float,
                        default=1.0,
                        help="CFG scale for the inverse-folding sampler")
    parser.add_argument("--sequence_timesteps", type=int, default=50)
    parser.add_argument("--sequence_layers", type=int, default=6)
    parser.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default="f32",
                        help="load-time parameter storage dtype for both "
                             "models (bf16 halves the HBM weight stream)")
    parser.add_argument("--synthetic", action="store_true")
    add_config_flags(parser, structure_sample_config())
    args = parser.parse_args()
    if not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    # shared/data + structure-architecture fields follow the structure
    # checkpoint's sidecar; the sequence-specific knobs follow its own
    cfg, _ = adopt_ckpt_config(cfg, parser, args.structure_ckpt)
    qside = load_ckpt_config(args.sequence_ckpt) or {}
    from e3diff_tpu.utils.presets import (
        _flag_on_command_line,
        _parser_flag_names,
    )
    known = _parser_flag_names(parser)   # prefix-abbreviation aware
    if not _flag_on_command_line("sequence_timesteps", known_flags=known) \
            and "timesteps" in qside:
        args.sequence_timesteps = qside["timesteps"]
    if not _flag_on_command_line("sequence_layers", known_flags=known) \
            and "num_hidden_layers" in qside:
        args.sequence_layers = qside["num_hidden_layers"]
    from e3diff_tpu.utils.presets import CKPT_BOUND_FIELDS
    shared = [k for k in CKPT_BOUND_FIELDS
              if k not in ("timesteps", "num_hidden_layers")]
    for key in shared:
        if key in qside and qside[key] != getattr(cfg, key):
            parser.error(
                f"checkpoint configs disagree on {key}: structure="
                f"{getattr(cfg, key)} vs sequence={qside[key]} — retrain "
                "or pass explicit flags")

    import dataclasses

    import jax
    import numpy as np

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.sampling import run_pipeline
    from e3diff_tpu.utils.builders import (
        build_sequence_model,
        build_structure_model,
    )
    from scripts.sample_sequence import load_params as load_seq_params
    from scripts.sample_structure import load_params as load_struct_params

    complexes = (synthetic_complexes(n=32) if args.synthetic
                 else load_complexes(args.data_file))
    test_ds = LigandBindingSiteData(complexes, "test", cfg.max_seq_len,
                                    cfg.pocket_ext, cfg.ligand_max_len)
    print(f"test={len(test_ds)} complexes")

    smodel = build_structure_model(cfg)
    qcfg = dataclasses.replace(cfg, timesteps=args.sequence_timesteps,
                               num_hidden_layers=args.sequence_layers)
    qmodel = build_sequence_model(qcfg)

    rng = jax.random.PRNGKey(cfg.seed)
    batch0 = next(test_ds.batches(cfg.batch_size))
    sparams = load_struct_params(args.structure_ckpt, smodel, batch0, rng,
                                 params_dtype=args.params_dtype)
    qparams = load_seq_params(args.sequence_ckpt, qmodel, batch0, rng,
                              params_dtype=args.params_dtype)

    results = run_pipeline(
        sparams, smodel, qparams, qmodel, test_ds, rng,
        batch_size=cfg.batch_size, structure_timesteps=cfg.timesteps,
        sequence_timesteps=args.sequence_timesteps,
        sampler=args.sampler, ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta, guidance_scale=args.guidance_scale,
        sequence_guidance_scale=args.sequence_guidance_scale,
        pdb_outdir=os.path.join(args.outdir, "pdbs"))

    print(f"mean recovery rate: {np.mean(results['recovery_rate']):.4f}")
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "results.pkl"), "wb") as f:
        pickle.dump({k: v for k, v in results.items()
                     if k != "pdb_paths"}, f)
    print(f"pipeline outputs in {args.outdir}")


if __name__ == "__main__":
    main()
