"""Tests for sample-quality evaluation utilities."""

import numpy as np

from e3diff_tpu.utils.evaluation import (
    angle_histograms,
    histogram_distance,
    mean_wrapped_angle_error,
    recovery_rate,
    summarize_samples,
)


def test_recovery_rate():
    pred = np.array([1, 2, 3, 4])
    true = np.array([1, 2, 0, 4])
    mask = np.array([1, 1, 1, 0])
    np.testing.assert_allclose(recovery_rate(pred, true, mask), 2 / 3)


def test_mean_wrapped_angle_error_zero_and_bounded():
    rng = np.random.default_rng(0)
    a = rng.uniform(-np.pi, np.pi, (50, 8))
    np.testing.assert_allclose(mean_wrapped_angle_error(a, a), 0, atol=1e-12)
    e = mean_wrapped_angle_error(a, a + 0.5)
    assert np.all(e <= 0.5)


def test_histograms_sum_to_one():
    rng = np.random.default_rng(1)
    a = rng.uniform(-np.pi, np.pi, (5000, 3))
    h = angle_histograms(a)
    np.testing.assert_allclose(h.sum(axis=1), 1.0, atol=1e-6)


def test_histogram_distance_discriminates():
    rng = np.random.default_rng(2)
    uniform = rng.uniform(-np.pi, np.pi, (20000, 2))
    uniform2 = rng.uniform(-np.pi, np.pi, (20000, 2))
    clustered = rng.normal(1.0, 0.1, (20000, 2))
    same = histogram_distance(uniform, uniform2)
    diff = histogram_distance(uniform, clustered)
    assert np.all(same < 0.05)
    assert np.all(diff > 0.5)


def test_summarize_samples():
    rng = np.random.default_rng(3)
    sampled = [rng.uniform(-np.pi, np.pi, (n, 8)) for n in (5, 9, 12)]
    reference = [rng.uniform(-np.pi, np.pi, (n, 8)) for n in (7, 11)]
    out = summarize_samples(sampled, reference)
    assert out["n_sampled_residues"] == 26
    assert out["n_reference_residues"] == 18
    assert set(out["tv_distance"]) == {
        "phi", "psi", "omega", "dihedral_o", "tau", "CA:C:1N", "1C:N:CA",
        "CA:C:O"}
