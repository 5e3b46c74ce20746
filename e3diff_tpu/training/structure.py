"""Jitted training/eval for the structure (angle) DDPM.

One fused step = PRNG noising + forward + per-channel radian losses +
backward + clip + AdamW — the TPU equivalent of the reference's
dataloader-worker noising + Lightning training_step
(structure_model/model.py:266-359, SURVEY.md §3.1).

Loss assignment (reference train_model.py:94-95): the first 4 feature
channels (dihedrals) use radian L1, the last 4 (bond angles) use smooth L1
with beta = pi/10; each channel averaged over unmasked ligand positions,
total = mean over the 8 channels.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from e3diff_tpu.diffusion.gaussian import GaussianAngleDiffusion
from e3diff_tpu.diffusion.guidance import drop_conditioning
from e3diff_tpu.ops.angles import wrap_angle
from e3diff_tpu.training.optim import accumulated_value_and_grad, ema_update

FEATURE_NAMES = ["phi", "psi", "omega", "dihedral_o",
                 "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"]
SMOOTH_L1_BETA = float(np.pi / 10)


def structure_loss_terms(pred_noise, known_noise, ligand_mask):
    """Per-channel masked losses; returns (8,) array ordered as
    FEATURE_NAMES. Identical value to the reference's boolean-index-then-
    mean (model.py:293-302).

    All 8 channels are computed in ONE fused masked reduction (a single
    pass over the (B, L, 8) tensors instead of 16 per-channel slices) —
    channel formulas are exactly radian_l1_loss (first 4, dihedrals) and
    radian_smooth_l1_loss(beta=pi/10) (last 4, bond angles).

    All arithmetic runs in float32 regardless of the model's compute
    dtype: under the bf16 preset the masked-mean denominator (and the
    per-element sums) would otherwise round in bfloat16, skewing every
    loss term by ~0.1% at B=64."""
    pred_noise = pred_noise.astype(jnp.float32)
    known_noise = known_noise.astype(jnp.float32)
    mask = ligand_mask.astype(jnp.float32)               # (B, L)
    # dihedral channels: radian_l1's wrap formulation
    d_l1 = (known_noise % (2 * jnp.pi)) - (pred_noise % (2 * jnp.pi))
    d_l1 = (d_l1 + jnp.pi) % (2 * jnp.pi) - jnp.pi
    l1 = jnp.abs(d_l1)
    # bond-angle channels: smooth-l1 on wrap_angle(target - input)
    d_s = wrap_angle(known_noise - pred_noise)
    abs_d = jnp.abs(d_s)
    huber = jnp.where(abs_d < SMOOTH_L1_BETA,
                      0.5 * (d_s ** 2) / SMOOTH_L1_BETA,
                      abs_d - 0.5 * SMOOTH_L1_BETA)
    per_elem = jnp.concatenate([l1[..., :4], huber[..., 4:]], axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_elem * mask[..., None], axis=(0, 1)) / denom


class TrainState(train_state.TrainState):
    # exponential-moving-average weights (None unless ema_decay > 0);
    # an inference-quality lever standard for diffusion models that the
    # reference lacks — default-off keeps the train-state pytree (and so
    # checkpoint compatibility) reference-faithful
    ema_params: Any = None


@dataclasses.dataclass(eq=False)  # hash by id: jit static self
class StructureTrainer:
    """Bundles model + diffusion + optimizer into jitted steps.

    `train_step(state, batch, rng)` and `eval_step(state, batch, rng)`
    operate on batches of:
      ligand_angles (B,L,8), ligand_attn_mask (B,L),
      receptor_angles (B,L,8), receptor_attn_mask (B,L),
      receptor_seq (B,L,20)
    """

    model: Any
    diffusion: GaussianAngleDiffusion
    optimizer: optax.GradientTransformation
    ema_decay: float = 0.0    # 0 = off (reference-faithful)
    accum_steps: int = 1      # >1: scan-accumulated microbatch gradients
                              # (training/optim.py::accumulated_value_and_grad)
    cond_dropout: float = 0.0  # classifier-free guidance: probability of
                               # replacing the pocket with the null
                               # conditioning per example (train only;
                               # 0 = off, reference-faithful —
                               # diffusion/guidance.py)

    def create_state(self, rng, sample_batch) -> TrainState:
        b = sample_batch["ligand_angles"].shape[:2]
        # jit the init: eager flax init dispatches op-by-op, which costs
        # ~107 s for the 146M model through the remote-TPU tunnel (25 ms
        # RTT per call); one compiled program halves it and is cacheable
        params = jax.jit(self.model.init)(
            rng,
            jnp.zeros((b[0],), jnp.int32),
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
        """The params tree as ShapeDtypeStructs — enough for the AdamW
        decay mask (tree paths only) and checkpoint restores, at zero
        device cost: eval_shape traces without computing, where a real
        146M init costs ~1-2 min of tunnel dispatch."""
        b = sample_batch["ligand_angles"].shape[:2]
        return jax.eval_shape(
            self.model.init, rng, jnp.zeros((b[0],), jnp.int32),
            np.asarray(sample_batch["ligand_angles"]),
            np.asarray(sample_batch["ligand_attn_mask"]),
            np.asarray(sample_batch["receptor_seq"]),
            np.asarray(sample_batch["receptor_angles"]),
            np.asarray(sample_batch["receptor_attn_mask"]),
        )["params"]

    def _losses(self, params, batch, rng, deterministic):
        if self.cond_dropout and not deterministic:
            # static branch (self is jit-static): at cond_dropout == 0
            # the PRNG stream is untouched and training stays
            # bit-identical to the reference-faithful step
            rng, rng_cfg = jax.random.split(rng)
            batch = drop_conditioning(rng_cfg, self.cond_dropout, batch)
        rng_noise, rng_drop = jax.random.split(rng)
        t, noise, x_t = self.diffusion.noise_batch(
            rng_noise, batch["ligand_angles"])
        pred = self.model.apply(
            {"params": params}, t, x_t,
            batch["ligand_attn_mask"], batch["receptor_seq"],
            batch["receptor_angles"], batch["receptor_attn_mask"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng_drop})
        terms = structure_loss_terms(pred, noise, batch["ligand_attn_mask"])
        return jnp.mean(terms), terms

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng):
        (loss, terms), grads = accumulated_value_and_grad(
            lambda p, b, r: self._losses(p, b, r, False),
            state.params, batch, rng, self.accum_steps)
        state = state.apply_gradients(grads=grads)
        if self.ema_decay:  # static branch: self is a jit-static arg
            state = state.replace(ema_params=ema_update(
                state.ema_params, state.params, self.ema_decay))
        metrics = {f"train_loss_{n}": terms[i]
                   for i, n in enumerate(FEATURE_NAMES)}
        metrics["train_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        loss, terms = self._losses(state.params, batch, rng, True)
        metrics = {f"val_loss_{n}": terms[i]
                   for i, n in enumerate(FEATURE_NAMES)}
        metrics["val_loss"] = loss
        return metrics
