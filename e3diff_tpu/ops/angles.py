"""Wrapped-angle arithmetic and radian losses.

JAX ports of structure_model/utils.py:20-131 (duplicated in
sequence_model/utils.py:5-75). These are traced inside jitted train steps,
so they are written in jnp and accept/return arrays of any shape.

Loss functions take an optional `mask` so that the reference's
boolean-index-then-mean (`model.py:293-302`) becomes a fixed-shape masked
mean — identical value, jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wrap_angle(vals, range_min: float = -np.pi, range_max: float = np.pi):
    """Modulo with wrapped range, e.g. wrap to [-pi, pi).

    Matches modulo_with_wrapped_range (structure_model/utils.py:20-40).
    """
    assert range_min <= 0.0 and range_min < range_max
    top_end = range_max - range_min
    return (vals - range_min) % top_end + range_min


def _masked_mean(vals, mask):
    if mask is None:
        return jnp.mean(vals)
    mask = mask.astype(vals.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(vals * mask) / denom


def radian_l1_loss(input, target, mask=None):
    """Mean absolute wrapped angular difference.

    Matches radian_l1_loss (structure_model/utils.py:61-76). With `mask`,
    averages only over positions where mask is true (same value as the
    reference's boolean-index-then-mean).
    """
    input = jnp.asarray(input)
    target = jnp.asarray(target)
    target = target % (2 * jnp.pi)
    input = input % (2 * jnp.pi)
    d = target - input
    d = (d + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return _masked_mean(jnp.abs(d), mask)


def radian_smooth_l1_loss(input, target, beta: float = 1.0,
                          circle_penalty: float = 0.0, mask=None):
    """Huber loss on the wrapped angular difference.

    Matches radian_smooth_l1_loss (structure_model/utils.py:78-109),
    including the circle_penalty regularizer on whole turns around the
    circle, `penalty * mean(trunc(|input| / pi))` — present for parity
    but never enabled by the reference training config (train_model.py:
    94-95 binds only beta=pi/10). With `mask`, both terms average only
    over positions where mask is true.
    """
    assert beta > 0
    input = jnp.asarray(input)
    target = jnp.asarray(target)
    d = wrap_angle(target - input, -np.pi, np.pi)
    abs_d = jnp.abs(d)
    per_elem = jnp.where(abs_d < beta, 0.5 * (d**2) / beta, abs_d - 0.5 * beta)
    loss = _masked_mean(per_elem, mask)
    if circle_penalty > 0:
        turns = jnp.trunc(jnp.abs(input) / jnp.pi)
        loss = loss + circle_penalty * _masked_mean(turns, mask)
    return loss


def tolerant_comparison_check(values, cmp: str, v) -> bool:
    """Numerically tolerant >= / <= check over an array (host-side helper).

    Matches tolerant_comparison_check (structure_model/utils.py:111-131).
    """
    values = np.asarray(values)
    if cmp == ">=":
        diff = np.nanmin(values) - v
        return bool(np.isclose(diff, 0, atol=1e-5) or diff > 0)
    if cmp == "<=":
        diff = np.nanmax(values) - v
        return bool(np.isclose(diff, 0, atol=1e-5) or diff < 0)
    raise ValueError(f"Illegal comparator: {cmp}")
