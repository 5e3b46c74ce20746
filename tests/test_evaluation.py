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


def test_joint_histogram_distance_bounds():
    from e3diff_tpu.utils.evaluation import joint_histogram_distance

    rng = np.random.default_rng(0)
    a = rng.uniform(-np.pi, np.pi, (40000, 8))
    # identical distributions -> small (576 bins of finite-sample noise)
    b = rng.uniform(-np.pi, np.pi, (40000, 8))
    assert joint_histogram_distance(a, b) < 0.1
    assert joint_histogram_distance(a, a) == 0.0
    # disjoint quadrants -> 1
    c = np.copy(a)
    c[:, 0] = np.abs(c[:, 0]) / 2            # phi in [0, pi/2]
    d = np.copy(b)
    d[:, 0] = -np.abs(d[:, 0]) / 2 - 0.01    # phi in [-pi/2, 0)
    assert joint_histogram_distance(c, d) > 0.99
    # marginals can match while the JOINT differs: same per-axis uniform,
    # but correlated vs anti-correlated quadrant structure
    n = 8000
    half = rng.uniform(0, np.pi - 1e-6, (n, 2))
    corr = np.where(rng.random((n, 1)) < 0.5, half, half - np.pi)
    anti = np.stack([corr[:, 0], -corr[:, 1] - 1e-6 * np.sign(corr[:, 1])],
                    axis=1)
    corr8 = np.zeros((n, 8)); corr8[:, :2] = corr
    anti8 = np.zeros((n, 8)); anti8[:, :2] = anti
    from e3diff_tpu.utils.evaluation import histogram_distance
    assert histogram_distance(corr8, anti8)[0] < 0.1   # phi marginal same
    assert joint_histogram_distance(corr8, anti8) > 0.8


def test_backbone_clash_fraction_detects_overlap():
    from e3diff_tpu.utils.evaluation import (
        backbone_clash_fraction, radius_of_gyration)

    # a straight, well-separated "backbone": 5 residues x 4 atoms along x
    n_res = 5
    coords = np.zeros((4 * n_res, 3))
    coords[:, 0] = np.arange(4 * n_res) * 1.5
    assert backbone_clash_fraction(coords) == 0.0

    # fold residue 4 back onto residue 0 -> clashes appear
    folded = np.copy(coords)
    folded[12:16] = coords[0:4] + 0.3
    assert backbone_clash_fraction(folded) > 0.0

    # adjacent-residue contacts are NOT clashes (covalent link)
    assert backbone_clash_fraction(coords, threshold=2.0) == 0.0

    # Rg: compact < extended
    compact = np.zeros_like(coords)
    compact[:, 0] = np.arange(4 * n_res) * 0.1
    assert radius_of_gyration(compact) < radius_of_gyration(coords)


def test_geometry_summary_on_real_like_angles():
    from e3diff_tpu.utils.evaluation import geometry_summary

    rng = np.random.default_rng(3)
    # helix-like torsions with idealized bond angles -> valid backbones
    sets = []
    for _ in range(4):
        n = rng.integers(6, 12)
        a = np.zeros((n, 8))
        a[:, 0] = -1.05 + rng.normal(0, 0.05, n)   # 'phi' column
        a[:, 1] = -0.79 + rng.normal(0, 0.05, n)   # 'psi'
        a[:, 2] = np.pi + rng.normal(0, 0.02, n)   # 'omega'
        a[:, 3] = rng.normal(0, 0.1, n)
        a[:, 4] = 1.94; a[:, 5] = 2.03; a[:, 6] = 2.13; a[:, 7] = 2.1
        sets.append(a)
    g = geometry_summary(sets)
    assert g["n_structures"] == 4
    assert g["n_nan_reconstructions"] == 0
    assert np.isfinite(g["rg_mean"]) and g["rg_mean"] > 1.0
    assert 0.0 <= g["clash_fraction_mean"] <= 1.0
