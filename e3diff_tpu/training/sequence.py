"""Jitted training/eval for the sequence D3PM (inverse folding).

One fused step = in-jit BLOSUM substitution noising + forward + losses +
backward + AdamW, replacing the reference's host-side per-token multinomial
loop + Lightning training_step (sequence_model/model.py:291-367).

Reference loss semantics kept exactly (SURVEY.md Q10/Q11):
* t sampled uniformly in {0..T} INCLUSIVE;
* the model is conditioned on t/T (float in [0,1]);
* noised_mask = positions where the noised class differs from the original
  (padding auto-excluded: both argmax to class 0/zero-vector);
* total loss = CE(noised positions) + ELBO(noised positions); the CE over
  un-noised ligand positions is computed and logged but NOT added.

The reference's CE over an empty noised set is NaN; we guard the masked
mean with max(count, 1) — only reachable when an entire batch draws
near-identity transitions, which the reference would NaN on.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from e3diff_tpu.diffusion.d3pm import D3PMDiffusion
from e3diff_tpu.diffusion.guidance import drop_conditioning
from e3diff_tpu.ops.elbo import elbo_loss
from e3diff_tpu.training.optim import accumulated_value_and_grad, ema_update


def masked_cross_entropy(logits, target_onehot, mask):
    """Mean CE over masked positions (== torch CE on boolean-indexed rows)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(target_onehot * logp, axis=-1)
    m = mask.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def sequence_losses(pred_logits, noised_seq, ligand_seq, ligand_mask):
    """Returns (total_loss, metrics dict) — reference get_loss
    (sequence_model/model.py:313-345).

    Loss arithmetic runs in float32 even when the model computes in bf16:
    log-softmax, masked means, and the ELBO KL would otherwise round in
    bfloat16 (including the masked-count denominators)."""
    pred_logits = pred_logits.astype(jnp.float32)
    lig_mask = ligand_mask.astype(bool)
    noised_mask = noised_seq.argmax(-1) != ligand_seq.argmax(-1)

    denom = jnp.maximum(lig_mask.sum(), 1)
    aa_noise_rate = (jnp.where(
        lig_mask, noised_seq.argmax(-1) == ligand_seq.argmax(-1), False
    ).sum() / denom)
    aa_recovery_rate = (jnp.where(
        lig_mask, pred_logits.argmax(-1) == ligand_seq.argmax(-1), False
    ).sum() / denom)

    aa_noised_loss = masked_cross_entropy(pred_logits, ligand_seq, noised_mask)
    aa_all_loss = masked_cross_entropy(
        pred_logits, ligand_seq, lig_mask & (~noised_mask))
    elbo = elbo_loss(pred_logits, ligand_seq, mask=noised_mask)

    total = aa_noised_loss + elbo
    return total, {
        "aa_noise_rate": aa_noise_rate,
        "aa_recovery_rate": aa_recovery_rate,
        "aa_noised_loss": aa_noised_loss,
        "aa_all_loss": aa_all_loss,
        "elbo_loss": elbo,
    }


class TrainState(train_state.TrainState):
    # EMA weights (None unless ema_decay > 0) — see training/structure.py
    ema_params: Any = None


@dataclasses.dataclass(eq=False)  # hash by id: jit static self
class SequenceTrainer:
    model: Any
    diffusion: D3PMDiffusion
    optimizer: optax.GradientTransformation
    ema_decay: float = 0.0    # 0 = off (reference-faithful)
    accum_steps: int = 1      # >1: scan-accumulated microbatch gradients
                              # (training/optim.py::accumulated_value_and_grad)
    cond_dropout: float = 0.0  # classifier-free guidance: probability of
                               # replacing the structural conditioning
                               # (pocket + ligand angles) with the null
                               # conditioning per example (train only;
                               # 0 = off — diffusion/guidance.py)

    def create_state(self, rng, sample_batch) -> TrainState:
        b = sample_batch["ligand_seq"].shape[0]
        # jit: eager init is dispatch-bound through the remote tunnel
        params = jax.jit(self.model.init)(
            rng,
            jnp.zeros((b, 1), jnp.float32),
            jnp.asarray(sample_batch["ligand_seq"]),
            jnp.asarray(sample_batch["ligand_angles"]),
            jnp.asarray(sample_batch["ligand_attn_mask"]),
            jnp.asarray(sample_batch["receptor_seq"]),
            jnp.asarray(sample_batch["receptor_angles"]),
            jnp.asarray(sample_batch["receptor_attn_mask"]),
        )["params"]
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=self.optimizer)
        if self.ema_decay:
            # materialize a DISTINCT buffer copy: ema must not alias
            # params (train_step donates the state, and XLA rejects
            # donating the same buffer through two leaves)
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, params))
        return state

    def abstract_params(self, rng, sample_batch):
        """Params tree as ShapeDtypeStructs via eval_shape — for the
        AdamW decay mask and checkpoint restores without paying a real
        device init (see StructureTrainer.abstract_params)."""
        import numpy as np

        b = sample_batch["ligand_seq"].shape[0]
        return jax.eval_shape(
            self.model.init, rng, jnp.zeros((b, 1), jnp.float32),
            np.asarray(sample_batch["ligand_seq"]),
            np.asarray(sample_batch["ligand_angles"]),
            np.asarray(sample_batch["ligand_attn_mask"]),
            np.asarray(sample_batch["receptor_seq"]),
            np.asarray(sample_batch["receptor_angles"]),
            np.asarray(sample_batch["receptor_attn_mask"]),
        )["params"]

    def _losses(self, params, batch, rng, deterministic):
        if self.cond_dropout and not deterministic:
            # static branch (self is jit-static): at cond_dropout == 0
            # the PRNG stream is untouched (see StructureTrainer)
            rng, rng_cfg = jax.random.split(rng)
            batch = drop_conditioning(rng_cfg, self.cond_dropout, batch,
                                      drop_ligand_angles=True)
        rng_t, rng_noise, rng_drop = jax.random.split(rng, 3)
        b = batch["ligand_seq"].shape[0]
        # Q10: t in {0..T} inclusive
        t_int = jax.random.randint(
            rng_t, (b,), 0, self.diffusion.timesteps + 1)
        t_norm = (t_int.astype(jnp.float32) / self.diffusion.timesteps)[:, None]
        noised = self.diffusion.apply_aa_noise(
            rng_noise, batch["ligand_seq"], t_int)
        pred = self.model.apply(
            {"params": params}, t_norm, noised,
            batch["ligand_angles"], batch["ligand_attn_mask"],
            batch["receptor_seq"], batch["receptor_angles"],
            batch["receptor_attn_mask"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng_drop})
        total, metrics = sequence_losses(
            pred, noised, batch["ligand_seq"], batch["ligand_attn_mask"])
        metrics["avg_timestep"] = t_int.mean()
        return total, metrics

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng):
        (loss, metrics), grads = accumulated_value_and_grad(
            lambda p, b, r: self._losses(p, b, r, False),
            state.params, batch, rng, self.accum_steps)
        state = state.apply_gradients(grads=grads)
        if self.ema_decay:  # static branch: self is a jit-static arg
            state = state.replace(ema_params=ema_update(
                state.ema_params, state.params, self.ema_decay))
        metrics = {f"train_{k}": v for k, v in metrics.items()}
        metrics["train_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        loss, metrics = self._losses(state.params, batch, rng, True)
        metrics = {f"val_{k}": v for k, v in metrics.items()}
        metrics["val_loss"] = loss
        return metrics
