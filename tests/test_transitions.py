"""Tests for D3PM transition kernels: golden values + parity with the
reference torch implementation (torch is CPU-available in this env)."""

import hashlib
import os

import numpy as np

from e3diff_tpu.ops import UniformTransition, BlosumTransition, load_blosum_asset
from e3diff_tpu.ops.transitions import interpolate_linear_align_corners, _ASSET_PATH


def test_asset_checksum_and_stats():
    digest = hashlib.sha256(open(_ASSET_PATH, "rb").read()).hexdigest()
    assert digest == "71b0a77ea9b2f388457e3346b31c3c0183cb9b6b7a3f9852a500e70fd69e5121"
    a = load_blosum_asset()
    score = a["original_score"]
    diag = np.diag(score)
    off = score[~np.eye(20, dtype=bool)]
    np.testing.assert_allclose(diag.mean(), 9.80, atol=0.01)
    np.testing.assert_allclose(off.mean(), 2.574, atol=0.01)
    np.testing.assert_allclose(a["Qtb_temperature"][0], 0.170227, atol=1e-5)
    np.testing.assert_allclose(a["Qtb_temperature"][-1], 15.044277, atol=1e-4)


def test_interpolation_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    v = load_blosum_asset()["Qtb_temperature"]
    want = F.interpolate(torch.tensor(v)[None, None], size=501, mode="linear",
                         align_corners=True).squeeze().numpy()
    got = interpolate_linear_align_corners(v, 501)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_blosum_qtbar_diag_golden():
    """Q-bar diag means at known temperatures (BASELINE.md)."""
    bt = BlosumTransition()
    # t_normal=0 -> index 0 -> temp 0.1702 -> near identity
    q0 = np.asarray(bt.get_Qt_bar(np.array([0.0])))[0]
    np.testing.assert_allclose(np.diag(q0).mean(), 0.9997, atol=2e-4)
    # t_normal=1 -> index 500 -> temp 15.044 -> near uniform
    q1 = np.asarray(bt.get_Qt_bar(np.array([1.0])))[0]
    np.testing.assert_allclose(np.diag(q1).mean(), 0.0787, atol=2e-4)
    # rows approximately sum to 1 (floor at 1e-6 applied post-softmax)
    np.testing.assert_allclose(q0.sum(-1), 1.0, atol=1e-4)
    assert q0.min() >= 1e-6


def test_blosum_parity_with_reference_formula():
    """Recompute softmax(score/temp) in torch and compare rows."""
    import torch

    asset = load_blosum_asset()
    temps = interpolate_linear_align_corners(asset["Qtb_temperature"], 501)
    bt = BlosumTransition()
    for t_normal in [0.0, 0.25, 0.5, 0.75, 1.0]:
        idx = int(round(t_normal * 500))
        want = torch.softmax(torch.tensor(asset["original_score"]) / temps[idx], dim=1)
        want = torch.clamp(want, min=1e-6).numpy()
        got = np.asarray(bt.get_Qt_bar(np.array([t_normal])))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_uniform_transition():
    ut = UniformTransition(20)
    q = np.asarray(ut.get_Qt_bar(np.array([0.4])))[0]
    want = 0.4 * np.eye(20) + 0.6 / 20
    np.testing.assert_allclose(q, want, rtol=1e-6)
    qt = np.asarray(ut.get_Qt(np.array([0.1])))[0]
    want = 0.1 / 20 + 0.9 * np.eye(20)
    np.testing.assert_allclose(qt, want, rtol=1e-6)
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-6)
