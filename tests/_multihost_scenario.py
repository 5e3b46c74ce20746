"""Shared tiny-model scenario for the multi-process multihost test.

Imported by BOTH the spawned workers (tests/_multihost_worker.py, two
real OS processes under jax.distributed) and the in-process
single-process reference run (tests/test_multihost_spawn.py). Everything
here must be deterministic across processes: model init and the
synthetic batch derive from fixed seeds only, so each process
materializes bit-identical host values before sharding.
"""

from __future__ import annotations

import numpy as np

MAXLEN = 16
N_ROWS = 8
N_STEPS = 3


def build():
    """(model, diffusion, trainer, numpy batch) for the scenario."""
    import jax

    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser, TransformerConfig
    from e3diff_tpu.training import StructureTrainer, make_optimizer

    def cfg(cross):
        return TransformerConfig(
            hidden_size=32, num_heads=4, num_layers=2,
            intermediate_size=64, max_position_embeddings=MAXLEN,
            dropout=0.0, attention_dropout=0.0,
            add_cross_attention=cross)

    ds = LigandBindingSiteData(
        synthetic_complexes(n=N_ROWS, seed=77, receptor_len_range=(8, 12),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1)
    batch = next(ds.batches(N_ROWS))
    batch = {k: v for k, v in batch.items()
             if k not in ("num_valid", "structure_ids")}

    model = StructureDenoiser(cfg(False), cfg(True))
    diffusion = GaussianAngleDiffusion.cosine(20)

    import jax.numpy as jnp  # noqa: F401 — ensures backend is CPU by now

    params = model.init(
        jax.random.PRNGKey(42), np.zeros((N_ROWS,), np.int32),
        *[np.asarray(batch[k]) for k in
          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
           "receptor_angles", "receptor_attn_mask"]])["params"]
    trainer = StructureTrainer(
        model, diffusion,
        make_optimizer(params, base_lr=1e-3, max_epochs=10,
                       steps_per_epoch=5))
    return model, diffusion, trainer, batch


def run_steps(trainer, state, gbatch):
    """N_STEPS deterministic train steps; returns (state, [losses])."""
    import jax

    losses = []
    for i in range(N_STEPS):
        rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
        state, metrics = trainer.train_step(state, dict(gbatch), rng)
        losses.append(float(metrics["train_loss"]))
    return state, losses
