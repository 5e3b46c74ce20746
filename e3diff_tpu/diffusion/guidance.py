"""Classifier-free guidance (CFG) for the conditional diffusion models.

Not in the reference (its models are always fully conditioned —
structure_model/model.py:180-215 and sequence_model/model.py:200-236
take the pocket context unconditionally). CFG is the standard
conditioning-strength lever for conditional diffusion (Ho & Salimans
2022): train with the conditioning randomly replaced by a canonical NULL
conditioning with probability p (``--cond_dropout``), then at sampling
combine the conditional and unconditional predictions

    pred = uncond + w * (cond - uncond)        (w = ``--guidance_scale``)

applied to the epsilon prediction for the continuous (structure) DDPM
and to the logits for the discrete (sequence) D3PM. w=1 is exactly the
conditional model — the samplers bypass CFG entirely at w=1, so the
default path stays bit-identical to the reference-faithful loop. w>1
sharpens pocket conditioning; w<1 relaxes it toward the prior.

The null conditioning is a zeroed pocket behind a single-token attention
mask: receptor_seq = 0, receptor_angles = 0, receptor_attn_mask =
[1, 0, 0, ...]. Zero features give every null-pocket token the same
embedding and one valid key gives cross-attention a well-defined
constant memory — no new parameters, so checkpoints stay structurally
identical (and torch-export-compatible) whether or not they were
trained with conditioning dropout.

For the sequence (inverse-folding) model the dropped conditioning is the
full structural context: the pocket fields AND the ligand backbone
angles (zeroed). ``ligand_attn_mask`` is never dropped — peptide length
is part of the task statement, not the conditioning.

TPU shape discipline: the guided samplers evaluate both branches as ONE
forward over a 2B batch (conditional half ‖ unconditional half) instead
of two B-sized forwards — identical FLOPs, half the per-step dispatch
and scan bookkeeping, and XLA sees a single static shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# batch fields that constitute the pocket conditioning (both models)
RECEPTOR_FIELDS = ("receptor_seq", "receptor_angles", "receptor_attn_mask")


def null_receptor(receptor_seq, receptor_angles, receptor_mask):
    """The canonical unconditional pocket: zero features, one valid key."""
    nmask = jnp.zeros_like(receptor_mask).at[:, 0].set(1)
    return (jnp.zeros_like(receptor_seq), jnp.zeros_like(receptor_angles),
            nmask)


def drop_conditioning(key, p: float, batch: dict,
                      drop_ligand_angles: bool = False) -> dict:
    """Per-example conditioning dropout for training.

    With probability ``p`` (independently per example) the receptor
    fields — and, for the sequence model, ``ligand_angles`` — are
    replaced by the null conditioning. Returns a new batch dict; the
    input is not mutated. ``p`` must be handled statically by the caller
    (skip the call when p == 0 so the PRNG stream is untouched and the
    reference-faithful path stays bit-identical)."""
    b = batch["receptor_attn_mask"].shape[0]
    drop = jax.random.bernoulli(key, p, (b,))

    def pick(cond_val, null_val):
        shape = (b,) + (1,) * (cond_val.ndim - 1)
        return jnp.where(drop.reshape(shape), null_val, cond_val)

    nseq, nang, nmask = null_receptor(
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])
    out = dict(batch)
    out["receptor_seq"] = pick(batch["receptor_seq"], nseq)
    out["receptor_angles"] = pick(batch["receptor_angles"], nang)
    out["receptor_attn_mask"] = pick(batch["receptor_attn_mask"], nmask)
    if drop_ligand_angles:
        out["ligand_angles"] = pick(batch["ligand_angles"],
                                    jnp.zeros_like(batch["ligand_angles"]))
    return out


def guided_combine(pred_2b, guidance_scale):
    """Split a 2B prediction (conditional half first) and combine.

    ``guidance_scale`` may be a scalar or a per-example ``(B,)`` vector
    (mixed-scale serving batches: each request rides its own w through
    one compiled program)."""
    cond, uncond = jnp.split(pred_2b, 2, axis=0)
    w = jnp.asarray(guidance_scale)
    if w.ndim:
        w = w.reshape((-1,) + (1,) * (cond.ndim - 1))
    return uncond + w * (cond - uncond)


def concat_cond_uncond(batch: dict, drop_ligand_angles: bool = False) -> dict:
    """Build the 2B guided-sampling batch: conditional half ‖ null half.

    Non-conditioning fields are tiled; conditioning fields get the null
    conditioning in the second half."""
    nseq, nang, nmask = null_receptor(
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])
    nulls = {"receptor_seq": nseq, "receptor_angles": nang,
             "receptor_attn_mask": nmask}
    if drop_ligand_angles:
        nulls["ligand_angles"] = jnp.zeros_like(batch["ligand_angles"])
    return {k: jnp.concatenate([v, nulls.get(k, v)], axis=0)
            for k, v in batch.items()}
