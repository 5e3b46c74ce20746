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


def cast_inference_params(params, dtype):
    """Cast floating-point parameter leaves to ``dtype`` for inference.

    The sampler/serving steps are HBM-bandwidth-bound (BENCHMARKS.md
    roofline: ~80% of the v5e HBM peak) and re-read the full parameter
    set every diffusion step — storing the 146M-param structure model in
    bfloat16 halves the dominant weight byte-stream. Training params stay
    f32 (the optimizer contract is untouched; this is a load-time cast on
    the inference paths only). ``dtype`` may be a jnp dtype or the
    strings "f32"/"float32"/"bf16"/"bfloat16", or "bf16_matmul" (cast
    only the >=2-D kernels — the weight-byte mass — keeping biases and
    LayerNorm affines f32); None is a no-op. Non-float leaves (none
    exist today) pass through unchanged.

    QUALITY (measured, BENCHMARKS.md "bf16 parameter storage"):
    "bf16_matmul" is the recommended inference setting — with bf16
    activations the compute path already rounds kernels to bf16
    in-program, so it is SAMPLE-IDENTICAL to f32 params while halving
    the weight stream (~9% on the B=32 headline). Full "bf16" also
    rounds the 1-D leaves (biases/LayerNorm/adaLN), whose systematic
    per-step bias accumulates across the reverse diffusion and
    collapsed flagship structure quality (TV 0.084 -> 0.399); it stays
    quality-safe (and 1.21x) only for the sequence model's 50-step
    D3PM. "int8_matmul" packs the >=2-D kernels as int8 + per-channel
    scales (utils/quant.py) — halves the weight stream AGAIN vs bf16;
    lossy (~0.4% kernel rms), gated by the measured quality harness
    (BENCHMARKS.md round 5). CLI defaults stay f32.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        return params
    if dtype == "int8_matmul":
        from e3diff_tpu.utils.quant import quantize_params_int8

        return quantize_params_int8(params)
    # "f32" stays a real cast (a no-op astype on already-f32 params) so
    # the CLIs can pass their flag straight through
    matmul_only = dtype == "bf16_matmul"
    if matmul_only:
        dtype = jnp.bfloat16
    elif isinstance(dtype, str):
        dtype = {"f32": jnp.float32, "float32": jnp.float32,
                 "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}[dtype]

    def cast(x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if matmul_only and x.ndim < 2:
            return x
        return x.astype(dtype)

    return jax.tree.map(cast, params)


def _restore_orbax(ckpt_path: str, abstract_params):
    from e3diff_tpu.training.checkpoint import CheckpointManager

    # tab-completed trailing slashes would make basename '' and point
    # the restore at the run dir itself
    ckpt_path = os.path.normpath(ckpt_path)
    mgr = CheckpointManager(os.path.dirname(ckpt_path) or ".")
    restored = mgr.restore(os.path.basename(ckpt_path),
                           {"params": abstract_params})
    return restored["params"]


def load_structure_params(ckpt_path: str, model, sample_batch, rng,
                          params_dtype=None):
    """Restore structure-denoiser params from orbax or a torch .pt.
    params_dtype: optional load-time cast (see cast_inference_params)."""
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
        return cast_inference_params(jax.tree.map(jnp.asarray, params),
                                     params_dtype)

    b = sample_batch["ligand_angles"].shape[0]
    abstract = jax.eval_shape(
        model.init, rng, jnp.zeros((b,), jnp.int32),
        jnp.asarray(sample_batch["ligand_angles"]),
        jnp.asarray(sample_batch["ligand_attn_mask"]),
        jnp.asarray(sample_batch["receptor_seq"]),
        jnp.asarray(sample_batch["receptor_angles"]),
        jnp.asarray(sample_batch["receptor_attn_mask"]))["params"]
    return cast_inference_params(_restore_orbax(ckpt_path, abstract),
                                 params_dtype)


def load_sequence_params(ckpt_path: str, model, sample_batch, rng,
                         params_dtype=None):
    """Restore sequence-denoiser params from orbax or a torch .pt.
    params_dtype: optional load-time cast (see cast_inference_params)."""
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
        return cast_inference_params(jax.tree.map(jnp.asarray, params),
                                     params_dtype)

    b = sample_batch["ligand_seq"].shape[0]
    abstract = jax.eval_shape(
        model.init, rng, jnp.zeros((b, 1)),
        jnp.asarray(sample_batch["ligand_seq"]),
        jnp.asarray(sample_batch["ligand_angles"]),
        jnp.asarray(sample_batch["ligand_attn_mask"]),
        jnp.asarray(sample_batch["receptor_seq"]),
        jnp.asarray(sample_batch["receptor_angles"]),
        jnp.asarray(sample_batch["receptor_attn_mask"]))["params"]
    return cast_inference_params(_restore_orbax(ckpt_path, abstract),
                                 params_dtype)
