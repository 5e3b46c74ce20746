"""End-to-end pipeline: sample angles -> reconstruct PDBs -> inverse-fold.

Rebuild of the reference's full flow (SURVEY.md §2.16):
  structure_model/sample.py (angles) -> create_pdb.py (coordinates,
  optional) -> sample_by_generated_angles.py (sequences with the uniform
  transition, ligand angles swapped for the generated ones).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from e3diff_tpu.data.dataset import LigandBindingSiteData
from e3diff_tpu.diffusion.d3pm import D3PMDiffusion
from e3diff_tpu.diffusion.gaussian import GaussianAngleDiffusion
from e3diff_tpu.geometry.chain import write_pdb_folder
from e3diff_tpu.ops.transitions import UniformTransition
from e3diff_tpu.sampling.sequence import sample_sequence_batches
from e3diff_tpu.sampling.structure import sample_structure_batches


def _pad_generated(angles_list, max_len, batches):
    """Pad per-sample (len_i, 8) angle arrays to max_len and chunk them to
    align with the given batches (incl. the zero-padded final batch)
    (sample_by_generated_angles.py:54-66)."""
    n_feat = angles_list[0].shape[1] if angles_list else 8
    padded = [np.pad(a, ((0, max_len - a.shape[0]), (0, 0)))
              for a in angles_list]
    chunks, pos = [], 0
    for batch in batches:
        rows = batch["ligand_angles"].shape[0]
        valid = int(batch.get("num_valid", rows))
        chunk = padded[pos:pos + valid]
        chunk += [np.zeros((max_len, n_feat), np.float32)] * (rows - valid)
        chunks.append(np.stack(chunk).astype(np.float32))
        pos += valid
    return chunks


def run_pipeline(
    structure_params,
    structure_model: Any,
    sequence_params,
    sequence_model: Any,
    test_data: LigandBindingSiteData,
    key,
    *,
    batch_size: int = 64,
    structure_timesteps: int = 1000,
    sequence_timesteps: int = 50,
    step: int = 1,
    pdb_outdir: str | None = None,
    diverse: bool = True,
    sampler: str = "ddpm",
    ddim_steps: int = 50,
    ddim_eta: float = 1.0,
    guidance_scale: float = 1.0,
    sequence_guidance_scale: float = 1.0,
) -> dict:
    """Returns the inverse-folding results dict plus the generated angles
    (and PDB paths when pdb_outdir is given)."""
    import jax

    key_s, key_q = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    diffusion = GaussianAngleDiffusion.cosine(structure_timesteps)
    batches = list(test_data.batches(batch_size))
    sampled = sample_structure_batches(
        structure_params, structure_model, diffusion, batches, key_s,
        step=step, first_batch_only=False, return_trajectory=False,
        sampler=sampler, ddim_steps=ddim_steps, ddim_eta=ddim_eta,
        guidance_scale=guidance_scale)

    pdb_paths = None
    if pdb_outdir is not None:
        os.makedirs(pdb_outdir, exist_ok=True)
        pdb_paths = write_pdb_folder(sampled, pdb_outdir)

    # end-to-end variant uses the uniform transition (reference
    # sample_by_generated_angles.py:253)
    d3pm = D3PMDiffusion.create(UniformTransition(20),
                                timesteps=sequence_timesteps)
    generated_batches = _pad_generated(
        sampled, getattr(test_data, "ligand_max_len", test_data.max_len),
        batches)
    results = sample_sequence_batches(
        sequence_params, sequence_model, d3pm, batches, key_q,
        diverse=diverse, generated_angles=generated_batches,
        guidance_scale=sequence_guidance_scale)
    results["generated_angles"] = sampled
    results["pdb_paths"] = pdb_paths
    return results
