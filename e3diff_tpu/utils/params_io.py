"""Checkpoint parameter loading shared by CLIs and the serving engine.

Restores model params from either an orbax checkpoint directory (the
framework's native format — 'final' or a train-state step) or a torch
``state_dict`` ``.pt`` file (the reference's save format,
structure_model/train_model.py:150 / sequence_model/train_model.py:145)
via the porting utilities. Restoring from orbax only needs the abstract
parameter tree, obtained with ``jax.eval_shape`` — a real ``model.init``
would pay ~minutes of dispatch through a tunneled TPU.
"""

from __future__ import annotations

import os


def _restore_orbax(ckpt_path: str, abstract_params):
    from e3diff_tpu.training.checkpoint import CheckpointManager

    # tab-completed trailing slashes would make basename '' and point
    # the restore at the run dir itself
    ckpt_path = os.path.normpath(ckpt_path)
    mgr = CheckpointManager(os.path.dirname(ckpt_path) or ".")
    restored = mgr.restore(os.path.basename(ckpt_path),
                           {"params": abstract_params})
    return restored["params"]


def load_structure_params(ckpt_path: str, model, sample_batch, rng):
    """Restore structure-denoiser params from orbax or a torch .pt."""
    import jax
    import jax.numpy as jnp

    if ckpt_path.endswith(".pt"):
        import torch

        from e3diff_tpu.utils.torch_port import port_structure_state_dict

        sd = {k: v.numpy() for k, v in
              torch.load(ckpt_path, map_location="cpu").items()}
        params = port_structure_state_dict(
            sd, model.encoder_config.num_layers,
            model.decoder_config.num_layers)
        if model.encoder_config.scan_layers:
            from e3diff_tpu.models.restack import params_to_scan

            params = params_to_scan(params)
        return jax.tree.map(jnp.asarray, params)

    b = sample_batch["ligand_angles"].shape[0]
    abstract = jax.eval_shape(
        model.init, rng, jnp.zeros((b,), jnp.int32),
        jnp.asarray(sample_batch["ligand_angles"]),
        jnp.asarray(sample_batch["ligand_attn_mask"]),
        jnp.asarray(sample_batch["receptor_seq"]),
        jnp.asarray(sample_batch["receptor_angles"]),
        jnp.asarray(sample_batch["receptor_attn_mask"]))["params"]
    return _restore_orbax(ckpt_path, abstract)


def load_sequence_params(ckpt_path: str, model, sample_batch, rng):
    """Restore sequence-denoiser params from orbax or a torch .pt."""
    import jax
    import jax.numpy as jnp

    if ckpt_path.endswith(".pt"):
        import torch

        from e3diff_tpu.utils.torch_port import port_sequence_state_dict

        sd = {k: v.numpy() for k, v in
              torch.load(ckpt_path, map_location="cpu").items()}
        params = port_sequence_state_dict(sd,
                                          model.decoder_config.num_layers)
        if model.decoder_config.scan_layers:
            from e3diff_tpu.models.restack import params_to_scan

            params = params_to_scan(params)
        return jax.tree.map(jnp.asarray, params)

    b = sample_batch["ligand_seq"].shape[0]
    abstract = jax.eval_shape(
        model.init, rng, jnp.zeros((b, 1)),
        jnp.asarray(sample_batch["ligand_seq"]),
        jnp.asarray(sample_batch["ligand_angles"]),
        jnp.asarray(sample_batch["ligand_attn_mask"]),
        jnp.asarray(sample_batch["receptor_seq"]),
        jnp.asarray(sample_batch["receptor_angles"]),
        jnp.asarray(sample_batch["receptor_attn_mask"]))["params"]
    return _restore_orbax(ckpt_path, abstract)
