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


def joint_histogram_distance(a: np.ndarray, b: np.ndarray,
                             i: int = 0, j: int = 1,
                             bins: int = 24) -> float:
    """Total-variation distance between two pooled 2D angle-pair
    distributions (default: the first two feature columns — the
    dataset's 'phi'/'psi' labels, which are physically omega/phi under
    quirk Q1). Marginal TVs can agree while the JOINT structure (the
    Ramachandran-style basins real backbones occupy) is wrong; this is
    the joint-level check."""
    rng = ((-np.pi, np.pi), (-np.pi, np.pi))
    ha, _, _ = np.histogram2d(a[:, i], a[:, j], bins=bins, range=rng)
    hb, _, _ = np.histogram2d(b[:, i], b[:, j], bins=bins, range=rng)
    ha = ha / max(ha.sum(), 1)
    hb = hb / max(hb.sum(), 1)
    return float(0.5 * np.abs(ha - hb).sum())


def backbone_clash_fraction(coords: np.ndarray,
                            threshold: float = 2.0) -> float:
    """Fraction of non-bonded backbone atom pairs closer than `threshold`
    Å in a reconstructed (4N, 3) N/CA/C/O backbone. Pairs within the same
    residue or bridging adjacent residues are covalently linked at NERF's
    idealized geometry and are excluded; everything else under 2 Å is a
    steric clash no real peptide has. 0 = clean, grows as the sampled
    torsions fold the chain through itself."""
    coords = np.asarray(coords, np.float64)
    m = coords.shape[0]
    if m < 12 or not np.isfinite(coords).all():
        return float("nan")
    res = np.arange(m) // 4                  # residue index per atom
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    sep = np.abs(res[:, None] - res[None, :])
    nonbonded = sep >= 2                     # >= 2 residues apart
    iu = np.triu_indices(m, 1)
    mask = nonbonded[iu]
    if not mask.any():
        return float("nan")
    return float((d[iu][mask] < threshold).mean())


def radius_of_gyration(coords: np.ndarray) -> float:
    """Rg of a backbone coordinate set (Å) — compactness summary; random
    torsions give inflated or collapsed chains vs the data's Rg range."""
    coords = np.asarray(coords, np.float64)
    c = coords - coords.mean(0)
    return float(np.sqrt((c ** 2).sum(axis=1).mean()))


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
        "joint_tv_phi_psi": round(
            joint_histogram_distance(pooled_s, pooled_r, 0, 1), 4),
        "n_sampled_residues": int(pooled_s.shape[0]),
        "n_reference_residues": int(pooled_r.shape[0]),
    }


def geometry_summary(angle_sets: list[np.ndarray]) -> dict:
    """Reconstruct each (len_i, 8) angle matrix into a 3D backbone (the
    float64 NERF oracle) and summarize steric validity + compactness.
    NaN-producing reconstructions are counted, matching the reference's
    NaN-guard-and-skip in create_pdb (create_pdb.py:393-395)."""
    from e3diff_tpu.geometry.chain import backbone_coords_from_angles

    clashes, rgs, n_nan = [], [], 0
    for s in angle_sets:
        s = np.asarray(s, np.float64)
        if s.shape[0] < 3:
            continue
        coords = backbone_coords_from_angles(s)
        if coords is None:
            n_nan += 1
            continue
        clashes.append(backbone_clash_fraction(coords))
        rgs.append(radius_of_gyration(coords))
    clash = np.asarray([c for c in clashes if np.isfinite(c)])
    return {
        "n_structures": len(angle_sets),
        "n_nan_reconstructions": n_nan,
        "clash_fraction_mean": (float(clash.mean()) if clash.size
                                else float("nan")),
        "clash_free_structures": (float((clash == 0).mean()) if clash.size
                                  else float("nan")),
        "rg_mean": float(np.mean(rgs)) if rgs else float("nan"),
        "rg_std": float(np.std(rgs)) if rgs else float("nan"),
    }
