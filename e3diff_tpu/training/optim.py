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
import jax.numpy as jnp
import optax


def accumulated_value_and_grad(loss_fn, params, batch, rng, n: int):
    """value_and_grad of `loss_fn(params, microbatch, rng)` averaged over
    `n` microbatches scanned sequentially — gradient accumulation inside
    one jitted step (the reference has none; SURVEY.md §2.17).

    Activation memory is that of a B/n forward/backward plus one
    params-sized gradient accumulator, so effective batches past the
    single-shot OOM point (B=256 for the 146M model — BENCHMARKS.md)
    train with `--batch_size 256 --accum_steps 4`.

    The batch (leading axis B, divisible by n) is split INTERLEAVED:
    microbatch j takes rows j, j+n, j+2n, …  Under data-parallel sharding
    the leading axis is contiguously sharded over the dp mesh axis, so an
    interleaved split keeps every microbatch evenly spread across devices
    (a contiguous split would put each whole microbatch on one device and
    serialize the mesh). Each microbatch consumes its own fold of `rng`
    (independent noise/dropout draws); the returned gradient is the MEAN
    of the n microbatch gradients — torch-style per-microbatch loss
    normalization, identical to a full-batch gradient whenever the loss
    denominators (mask counts) are balanced across microbatches.

    Returns ((mean_loss, mean_aux), mean_grads); `loss_fn` must return
    (loss, aux) with aux an addable pytree (has_aux=True semantics).
    """
    if n <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
    b = jax.tree.leaves(batch)[0].shape[0]
    if b % n:
        raise ValueError(f"batch size {b} not divisible by accum_steps {n}")
    micro = jax.tree.map(lambda a: a.reshape(b // n, n, *a.shape[1:]), batch)
    rngs = jax.random.split(rng, n)
    mb0 = jax.tree.map(lambda a: a[:, 0], micro)
    out_shape = jax.eval_shape(loss_fn, params, mb0, rngs[0])
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         (out_shape, jax.eval_shape(lambda p: p, params)))

    def body(carry, xs):
        (loss_acc, aux_acc), g_acc = carry
        j, r = xs
        mb = jax.tree.map(lambda a: a[:, j], micro)
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, r)
        return ((loss_acc + loss, jax.tree.map(jnp.add, aux_acc, aux)),
                jax.tree.map(jnp.add, g_acc, g)), None

    ((loss_sum, aux_sum), g_sum), _ = jax.lax.scan(
        body, zeros, (jnp.arange(n), rngs))
    inv = 1.0 / n
    return ((loss_sum * inv, jax.tree.map(lambda a: a * inv, aux_sum)),
            jax.tree.map(lambda g: g * inv, g_sum))


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
    mu_dtype: str = "f32",
) -> optax.GradientTransformation:
    """mu_dtype: 'f32' (reference-faithful torch AdamW exp_avg) or 'bf16'
    (first moment stored in bfloat16 — halves the mu read+write stream of
    the HBM-bandwidth-bound train step, BENCHMARKS.md floor analysis; the
    second moment stays f32: its squared-gradient magnitudes underflow
    bf16's 8-bit exponent-adjacent precision far sooner than the
    sign-carrying mu does)."""
    if mu_dtype not in ("f32", "bf16"):
        raise ValueError(f"mu_dtype must be f32 or bf16, got {mu_dtype!r}")
    schedule = linear_warmup_per_epoch(base_lr, max_epochs, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
            mask=_decay_mask(params_example),
            mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None,
        ),
    )
