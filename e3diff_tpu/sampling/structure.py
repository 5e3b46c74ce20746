"""Batched structure (angle) sampling.

Rebuild of structure_model/sample.py:200-245: chunk the test set into
fixed-size batches, draw wrapped-Gaussian initial noise, run the
1000-step DDPM reverse loop, and trim each sample's trajectory to its true
ligand length. The whole reverse loop is ONE jitted lax.scan per batch
shape; only the final trajectory is pulled to host.

Reference quirk Q5 (the `break` after the first batch, sample.py:237) is
exposed as ``first_batch_only`` (default True = reference-faithful).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from e3diff_tpu.data.dataset import strip_meta
from e3diff_tpu.diffusion.gaussian import (
    GaussianAngleDiffusion,
    sample_wrapped_noise,
)
from e3diff_tpu.diffusion.guidance import guided_combine, null_receptor
from e3diff_tpu.utils.quant import dequantize_params


from e3diff_tpu.utils.jit_cache import JitSamplerCache

# bounded LRU: repeated make_structure_sampler calls for the same
# (model, diffusion, flags) reuse the compiled program instead of
# repaying a 30-340 s remote recompile; see utils/jit_cache.py.
_SAMPLER_CACHE = JitSamplerCache(maxsize=8)


def make_structure_sampler(model, diffusion: GaussianAngleDiffusion,
                           step: int = 1, return_trajectory: bool = True,
                           trajectory_dtype=None, sampler: str = "ddpm",
                           ddim_steps: int = 50, ddim_eta: float = 1.0,
                           guidance_scale: float = 1.0,
                           guided: bool | None = None):
    """Returns a jitted f(params, batch, key) -> (final, trajectory).
    Cached per (model, diffusion, step, flags) so repeated calls reuse the
    compiled program.

    sampler="ddpm" is the reference-faithful ancestral loop (T forwards,
    optionally strided — a lossy skip, see BENCHMARKS.md); "ddim" runs
    the correct accelerated subsequence (ddim_steps forwards, ddim_eta
    stochasticity) — not in the reference.

    guidance_scale != 1 applies classifier-free guidance to the epsilon
    prediction (diffusion/guidance.py; meaningful for checkpoints trained
    with --cond_dropout > 0). Both branches run as one 2B-batch forward
    per step; w=1 compiles the plain conditional program (bit-identical
    to no-CFG). The scale itself is a TRACED scalar of the guided
    program, so sweeping w recompiles nothing; ``guided=True`` forces
    the guided program even at scale 1 (CFG-enabled serving engines that
    default to w=1 but honor per-request scales)."""
    if sampler not in ("ddpm", "ddim"):
        raise ValueError(f"unknown sampler {sampler!r}")
    if guided is None:
        guided = guidance_scale != 1.0
    key = (id(model), id(diffusion), step, return_trajectory,
           str(trajectory_dtype), sampler, ddim_steps, float(ddim_eta),
           guided)
    inner = _SAMPLER_CACHE.get(key, model, diffusion)
    if inner is not None:
        return _bind_scale(inner, guidance_scale)

    @jax.jit
    def inner(params, batch, key, scale):
        key_init, key_loop = jax.random.split(key)
        x_init = sample_wrapped_noise(
            key_init, batch["ligand_angles"].shape,
            batch["ligand_angles"].dtype)

        # the pocket encoding is timestep-independent: compute ONCE, not
        # once per diffusion step (the reference re-encodes every step)
        rec_seq, rec_ang = batch["receptor_seq"], batch["receptor_angles"]
        rec_mask, lig_mask = (batch["receptor_attn_mask"],
                              batch["ligand_attn_mask"])
        if guided:
            # conditional half ‖ null half — one 2B encode, one 2B
            # decode per step (same FLOPs as two B-sized forwards)
            nseq, nang, nmask = null_receptor(rec_seq, rec_ang, rec_mask)
            rec_seq = jnp.concatenate([rec_seq, nseq], axis=0)
            rec_ang = jnp.concatenate([rec_ang, nang], axis=0)
            rec_mask = jnp.concatenate([rec_mask, nmask], axis=0)
            lig_mask = jnp.concatenate([lig_mask, lig_mask], axis=0)
        # int8_matmul params: the one-shot encoder/cross-KV work uses a
        # dequantized view computed once per call...
        fparams = dequantize_params(params)
        enc_out = model.apply(
            {"params": fparams}, rec_seq, rec_ang, rec_mask,
            deterministic=True, method=model.encode_receptor)
        # the decoder's cross-attention k/v over that encoding are ALSO
        # timestep-independent: project them once here instead of inside
        # every one of the T scan steps (bit-identical numerics)
        cross_kv = model.apply(
            {"params": fparams}, enc_out, method=model.precompute_cross_kv)

        def denoise_fn(t_vec, x):
            if guided:
                t_vec = jnp.concatenate([t_vec, t_vec], axis=0)
                x = jnp.concatenate([x, x], axis=0)
            # ...while the per-step decoder weights dequantize INSIDE the
            # scan body: the HBM-resident form the loop streams every step
            # stays int8 (+ scales), and the dequant multiply fuses into
            # the consumer matmuls. For unquantized params both calls are
            # pure pass-throughs (no ops inserted).
            pred = model.apply(
                {"params": dequantize_params(params)}, t_vec, x, lig_mask,
                enc_out, rec_mask, deterministic=True, method=model.decode,
                cross_kv=cross_kv)
            return guided_combine(pred, scale) if guided else pred

        if sampler == "ddim":
            return diffusion.sample_loop_ddim(
                denoise_fn, key_loop, x_init, n_steps=ddim_steps,
                eta=ddim_eta, return_trajectory=return_trajectory,
                trajectory_dtype=trajectory_dtype)
        return diffusion.sample_loop(
            denoise_fn, key_loop, x_init, step=step,
            return_trajectory=return_trajectory,
            trajectory_dtype=trajectory_dtype)

    _SAMPLER_CACHE.put(key, inner, model, diffusion)
    return _bind_scale(inner, guidance_scale)


def _bind_scale(inner, guidance_scale: float):
    """f(params, batch, key, scale) -> f(params, batch, key[, scale]).
    The scale rides as a traced array, so every w — and per-example
    (B,) scale vectors from mixed-scale serving batches — shares one
    compiled program (modulo the scalar->vector retrace)."""
    default = jnp.float32(guidance_scale)

    def run(params, batch, key, scale=None):
        s = default if scale is None else jnp.asarray(scale, jnp.float32)
        return inner(params, batch, key, s)

    run.inner = inner   # the shared jitted program (cache identity)
    return run


def sample_structure_batches(
    params,
    model: Any,
    diffusion: GaussianAngleDiffusion,
    batches: Iterable[dict],
    key,
    *,
    step: int = 1,
    first_batch_only: bool = True,
    return_trajectory: bool = True,
    trajectory_dtype=None,
    sampler: str = "ddpm",
    ddim_steps: int = 50,
    ddim_eta: float = 1.0,
    guidance_scale: float = 1.0,
) -> list[np.ndarray]:
    """Returns a list of per-sample arrays shaped (T, len_i, 8) (trajectory)
    or (len_i, 8) (final only), matching the reference output.pkl layout.

    Device->host transfer of batch n's trajectory overlaps batch n+1's
    on-device sampling (dispatch is async; materialization of completed
    buffers is pure IO). Through this environment's remote-TPU tunnel the
    full (1000, 64, 64, 8) f32 trajectory takes ~10 s to pull — LONGER
    than the 6.8 s of sampling compute — so the overlap (and the optional
    bfloat16 trajectory_dtype, 2x smaller) is where the wall-clock is
    (BENCHMARKS.md round-2 measurements)."""
    run = make_structure_sampler(model, diffusion, step=step,
                                 return_trajectory=return_trajectory,
                                 trajectory_dtype=trajectory_dtype,
                                 sampler=sampler, ddim_steps=ddim_steps,
                                 ddim_eta=ddim_eta,
                                 guidance_scale=guidance_scale)

    def materialize(pending):
        final, traj, lengths, num_valid = pending
        if return_trajectory:
            traj = np.asarray(traj)
            if traj.dtype != np.float32:  # bf16 travels; f32 lands on host
                traj = traj.astype(np.float32)
            return [traj[:, i, :lengths[i], :] for i in range(num_valid)]
        final = np.asarray(final)
        return [final[i, :lengths[i], :] for i in range(num_valid)]

    results = []
    pending = None
    for batch in batches:
        key, bkey = jax.random.split(key)
        jbatch = {k: jnp.asarray(v)
                  for k, v in strip_meta(batch).items()}
        final, traj = run(params, jbatch, bkey)  # async dispatch
        lengths = np.asarray(batch["ligand_attn_mask"]).sum(1).astype(int)
        num_valid = int(batch.get("num_valid", len(lengths)))
        if pending is not None:
            results.extend(materialize(pending))
        pending = (final, traj, lengths, num_valid)
        if first_batch_only:
            break
    if pending is not None:
        results.extend(materialize(pending))
    return results
