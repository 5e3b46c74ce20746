"""Optimizer: AdamW + per-epoch linear warmup + global-norm clipping.

Reference: AdamW(lr=5e-5, weight_decay=0.1) over ALL parameters
(structure_model/model.py:361-369; torch AdamW decays everything by
default), HF get_linear_schedule_with_warmup stepped once per EPOCH with
num_training_steps = max_epochs (quirk Q12, structure_model/model.py:
384-399), and Lightning's gradient_clip_val=1.0 (global norm).

The only parameter excluded from weight decay is the Gaussian Fourier
projection W — a non-trainable buffer in the reference (its gradients are
zero via stop_gradient, so masking decay alone freezes it exactly).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def ema_update(ema_params, params, decay: float):
    """ema <- decay * ema + (1 - decay) * params, elementwise. The
    standard diffusion-model EMA (not in the reference; default-off)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)


def linear_warmup_per_epoch(base_lr: float, max_epochs: int,
                            steps_per_epoch: int) -> Callable:
    """lr(step) replicating HF linear warmup/decay evaluated at
    epoch = step // steps_per_epoch with warmup = int(0.1 * max_epochs)
    epochs and num_training_steps = max_epochs."""
    warmup = int(max_epochs * 0.1)

    def schedule(step):
        epoch = step // steps_per_epoch
        epoch = epoch.astype(jax.numpy.float32) if hasattr(epoch, "astype") else float(epoch)
        warm = epoch / max(1.0, float(warmup))
        decay = (max_epochs - epoch) / max(1.0, float(max_epochs - warmup))
        factor = jax.numpy.where(epoch < warmup, warm, jax.numpy.maximum(0.0, decay))
        return base_lr * factor

    return schedule


def _decay_mask(params):
    """Decay everything except the fixed Fourier W buffers."""

    def mask_fn(path, _):
        return not any(getattr(p, "key", None) == "W" for p in path)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    params_example,
    base_lr: float = 5e-5,
    weight_decay: float = 0.1,
    max_epochs: int = 150,
    steps_per_epoch: int = 250,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    schedule = linear_warmup_per_epoch(base_lr, max_epochs, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
            mask=_decay_mask(params_example),
        ),
    )
