"""Sample-quality evaluation utilities.

The reference evaluates by (a) per-sample amino-acid recovery rate
(sequence_model/sample.py:216-228) and (b) a wrapped-angle error recipe
left as a comment (create_pdb.py:450-453). This module implements both
plus distribution-level comparisons used by BASELINE.md's
"sampled-angle distributions match to numerical tolerance" criterion.
"""

from __future__ import annotations

import numpy as np

from e3diff_tpu.data.dataset import FEATURE_NAMES
from e3diff_tpu.ops.angles import wrap_angle


def recovery_rate(pred_idx: np.ndarray, true_idx: np.ndarray,
                  mask: np.ndarray) -> float:
    m = np.asarray(mask).astype(bool)
    denom = max(m.sum(), 1)
    return float((np.asarray(pred_idx)[m] == np.asarray(true_idx)[m]).sum()
                 / denom)


def mean_wrapped_angle_error(true_angles, generated) -> np.ndarray:
    """Per-feature mean wrapped error as a fraction of a full turn —
    the reference recipe: abs(wrap(d).mean(0)/pi*180)/360."""
    d = np.asarray(true_angles) - np.asarray(generated)
    wrapped = np.asarray(wrap_angle(d))
    return np.abs(wrapped.mean(axis=0) / np.pi * 180) / 360


def angle_histograms(angles: np.ndarray, bins: int = 36) -> np.ndarray:
    """Per-feature normalized histograms over [-pi, pi).

    angles: (N, F) pooled valid residues. Returns (F, bins)."""
    angles = np.asarray(angles)
    out = []
    for i in range(angles.shape[1]):
        h, _ = np.histogram(angles[:, i], bins=bins, range=(-np.pi, np.pi),
                            density=True)
        out.append(h * (2 * np.pi / bins))   # probability mass per bin
    return np.stack(out)


def histogram_distance(a: np.ndarray, b: np.ndarray, bins: int = 36) -> np.ndarray:
    """Per-feature total-variation distance between two pooled angle sets
    (0 = identical distributions, 1 = disjoint)."""
    ha = angle_histograms(a, bins)
    hb = angle_histograms(b, bins)
    return 0.5 * np.abs(ha - hb).sum(axis=1)


def summarize_samples(sampled: list[np.ndarray],
                      reference: list[np.ndarray],
                      feature_names=tuple(FEATURE_NAMES)) -> dict:
    """Pool per-sample (len_i, F) angle matrices and compare distributions."""
    pooled_s = np.concatenate([np.asarray(s).reshape(-1, len(feature_names))
                               for s in sampled])
    pooled_r = np.concatenate([np.asarray(r).reshape(-1, len(feature_names))
                               for r in reference])
    tv = histogram_distance(pooled_s, pooled_r)
    return {
        "tv_distance": dict(zip(feature_names, tv.round(4).tolist())),
        "tv_distance_mean": float(tv.mean()),
        "n_sampled_residues": int(pooled_s.shape[0]),
        "n_reference_residues": int(pooled_r.shape[0]),
    }
