"""Train the structure (angle) DDPM — CLI equivalent of
structure_model/train_model.py.

Example:
    python scripts/train_structure.py --data_file data/biolip.pt \
        --ckpt_dir runs/structure_ext4 --pocket_ext 4 --max_seq_len 128
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e3diff_tpu.utils.presets import (  # noqa: E402
    add_config_flags,
    config_from_args,
    reconcile_run_config,
    save_config,
    structure_train_config,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_file", default=None,
                        help="complex file (.pt or .pkl); optional with --synthetic")
    parser.add_argument("--ckpt_dir", default="./runs/structure")
    parser.add_argument("--synthetic", action="store_true",
                        help="use a synthetic dataset (no BioLiP needed)")
    parser.add_argument("--synthetic_n", type=int, default=64)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before any backend touch (multi-process runs; auto-detected on TPU pods)")
    parser.add_argument("--dp", type=int, default=None,
                        help="data-parallel extent (default: all devices)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--profile_dir", default=None,
                        help="jax.profiler trace dir; profiles one epoch "
                             "and prints the device-bucket digest")
    add_config_flags(parser, structure_train_config())
    args = parser.parse_args()
    if not args.synthetic and not args.data_file:
        parser.error("--data_file is required unless --synthetic")
    cfg = config_from_args(args)
    if cfg.accum_steps < 1 or cfg.batch_size % cfg.accum_steps:
        parser.error(f"--batch_size {cfg.batch_size} must be divisible "
                     f"by --accum_steps {cfg.accum_steps}")
    if args.multihost:
        # before ANY backend touch (including the sidecar's process gate)
        from e3diff_tpu.parallel import initialize_multihost

        pidx, pcount = initialize_multihost()
        print(f"multihost: process {pidx}/{pcount}")

    import jax

    # resuming without repeating the original flags adopts the run's
    # checkpoint-bound fields (explicit mismatches fail loudly); the
    # sampling-CLI sidecar is written once, by process 0, atomically
    cfg, _ = reconcile_run_config(cfg, args.ckpt_dir, parser)
    if jax.process_index() == 0:
        save_config(cfg, args.ckpt_dir)

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.data.dataset import load_complexes
    from e3diff_tpu.parallel import make_mesh, shard_batch, shard_params
    from e3diff_tpu.training import StructureTrainer, make_optimizer
    from e3diff_tpu.training.loop import train_loop
    from e3diff_tpu.utils.builders import (
        build_structure_diffusion,
        build_structure_model,
    )

    complexes = (synthetic_complexes(n=args.synthetic_n) if args.synthetic
                 else load_complexes(args.data_file))
    train_ds = LigandBindingSiteData(complexes, "train", cfg.max_seq_len,
                                     cfg.pocket_ext, cfg.ligand_max_len)
    val_ds = LigandBindingSiteData(complexes, "validation", cfg.max_seq_len,
                                   cfg.pocket_ext, cfg.ligand_max_len)
    print(f"train={len(train_ds)} val={len(val_ds)} complexes")

    model = build_structure_model(cfg)
    diffusion = build_structure_diffusion(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    sample_batch = next(train_ds.batches(cfg.batch_size))
    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)

    clean_batch = {k: v for k, v in sample_batch.items()
                   if k not in ("num_valid", "structure_ids")}

    def make_opt(params_example):
        return make_optimizer(
            params_example, base_lr=cfg.lr, weight_decay=cfg.l2_norm,
            max_epochs=cfg.max_epochs, steps_per_epoch=steps_per_epoch,
            grad_clip=cfg.gradient_clip, mu_dtype=cfg.mu_dtype)

    # the optimizer's decay mask only needs the params TREE — eval_shape
    # provides it for free (a throwaway real init costs ~1-2 min of
    # tunnel dispatch for the 146M model)
    abstract = StructureTrainer(model, diffusion, None).abstract_params(
        rng, clean_batch)
    trainer = StructureTrainer(model, diffusion, make_opt(abstract),
                               ema_decay=cfg.ema_decay,
                               accum_steps=cfg.accum_steps,
                               cond_dropout=cfg.cond_dropout)
    resuming = os.path.isdir(os.path.join(args.ckpt_dir, "last"))
    if resuming and len(jax.devices()) == 1:
        # restore only needs the state TREE as a template — skip the
        # ~1-2 min device init that the checkpoint immediately replaces
        state = jax.eval_shape(
            lambda: trainer.create_state(rng, clean_batch))
    else:
        state = trainer.create_state(rng, clean_batch)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Model has {n_params} trainable parameters")

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        state = state.replace(params=shard_params(state.params, mesh))
        if state.ema_params is not None:
            state = state.replace(
                ema_params=shard_params(state.ema_params, mesh))
        print(f"mesh: {dict(mesh.shape)}")

    def train_batches(epoch):
        for b in train_ds.batches(cfg.batch_size, shuffle=True,
                                  seed=cfg.seed + epoch, drop_last=True):
            yield shard_batch(b, mesh) if mesh else b

    def val_batches():
        yield from val_ds.batches(cfg.batch_size)

    state, history = train_loop(
        trainer, state, train_batches, val_batches, rng,
        max_epochs=cfg.max_epochs, min_epochs=cfg.min_epochs,
        ckpt_dir=args.ckpt_dir, ckpt_every=cfg.ckpt_every,
        ckpt_mode=cfg.ckpt_mode,
        profile_dir=args.profile_dir)
    if not history:
        # resumed at/after max_epochs: nothing ran — keep the original
        # run's history.json instead of clobbering it with []
        print("done; no epochs to run (already trained to max_epochs)")
        return
    if jax.process_index() == 0:   # one writer on shared storage
        import json
        with open(os.path.join(args.ckpt_dir, "history.json"), "w") as f:
            json.dump(history, f, indent=1)
    print(f"done; final val_loss="
          f"{history[-1].get('val_loss', float('nan')):.4f}")


if __name__ == "__main__":
    main()
