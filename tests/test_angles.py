"""Tests for wrapped-angle math and radian losses, including the reference's
embedded doctests (structure_model/utils.py) as unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from e3diff_tpu.ops import (
    wrap_angle,
    radian_l1_loss,
    radian_smooth_l1_loss,
    tolerant_comparison_check,
)


def test_wrap_angle_doctest():
    # >>> modulo_with_wrapped_range(3, -2, 2) -> -1
    assert wrap_angle(3, -2, 2) == -1


def test_wrap_angle_range():
    vals = np.linspace(-10, 10, 401)
    wrapped = np.asarray(wrap_angle(vals))
    assert np.all(wrapped >= -np.pi - 1e-6)
    assert np.all(wrapped < np.pi + 1e-6)
    # wrap is identity on in-range values
    inr = np.linspace(-np.pi, np.pi - 1e-3, 50)
    np.testing.assert_allclose(np.asarray(wrap_angle(inr)), inr, atol=1e-6)


def test_radian_l1_doctests():
    np.testing.assert_allclose(
        float(radian_l1_loss(jnp.asarray(0.1), 2 * np.pi)), 0.1, atol=1e-6)
    np.testing.assert_allclose(
        float(radian_l1_loss(jnp.asarray(0.1), jnp.asarray(2 * np.pi - 0.1))),
        0.2, atol=1e-6)


def test_radian_smooth_l1_doctest():
    np.testing.assert_allclose(
        float(radian_smooth_l1_loss(jnp.asarray(-17.0466), jnp.asarray(-1.3888), beta=0.1)),
        3.0414, atol=1e-4)


def test_masked_loss_equals_boolean_indexing():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(4, 8)).astype(np.float32)
    target = rng.normal(size=(4, 8)).astype(np.float32)
    mask = rng.random((4, 8)) > 0.4

    got = float(radian_l1_loss(pred, target, mask=jnp.asarray(mask)))
    want = float(radian_l1_loss(pred[mask], target[mask]))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got = float(radian_smooth_l1_loss(pred, target, beta=np.pi / 10, mask=jnp.asarray(mask)))
    want = float(radian_smooth_l1_loss(pred[mask], target[mask], beta=np.pi / 10))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tolerant_comparison_doctest():
    assert tolerant_comparison_check(-3.1415927410125732, ">=", -np.pi)
    assert tolerant_comparison_check(np.array([0.0, 3.14159]), "<=", np.pi)
    assert not tolerant_comparison_check(np.array([4.0]), "<=", np.pi)
    with pytest.raises(ValueError):
        tolerant_comparison_check(np.array([0.0]), "==", 0)


def test_circle_penalty_parity_vs_reference():
    """The circle_penalty regularizer (unused by the reference training
    config but part of radian_smooth_l1_loss's surface) matches torch."""
    import torch
    from reference_compat import load_reference_module

    ref_utils = load_reference_module("structure_model", "utils")
    rng = np.random.default_rng(3)
    pred = (rng.normal(size=(64,)) * 4).astype(np.float32)
    target = (rng.normal(size=(64,)) * 4).astype(np.float32)
    for penalty in (0.1, 1.0):
        want = float(ref_utils.radian_smooth_l1_loss(
            torch.tensor(pred), torch.tensor(target), beta=np.pi / 10,
            circle_penalty=penalty))
        got = float(radian_smooth_l1_loss(
            jnp.asarray(pred), jnp.asarray(target), beta=np.pi / 10,
            circle_penalty=penalty))
        np.testing.assert_allclose(got, want, rtol=1e-5)
