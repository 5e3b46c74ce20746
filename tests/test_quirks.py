"""Quirk-ledger regression index (SURVEY.md §8).

Each behavior-defining reference quirk gets an explicit regression test so
a well-meaning cleanup can't silently change semantics. Several quirks are
exercised in depth elsewhere; this module is the authoritative index:

Q1  angle column misnaming            -> test_q1 here + test_preprocessing
Q2  pocket ext exactly-±ext wraparound -> test_data.test_pocket_ext_wraparound_quirk
Q3  BLOSUM indexed by alpha_bar       -> test_q3 here + test_diffusion_parity
Q4  checkpoint mode='max'             -> test_checkpoint.test_best_tracker_q4_mode_max
Q5  sampler first-batch break         -> test_sampling.test_structure_sampling_trajectory_layout
Q6  position ids unused               -> models never compute them (by construction)
Q7  shared ligand/receptor SELayer    -> test_q7 here + test_model_parity (full forward)
Q8  Q_bar @ x column orientation      -> test_diffusion_parity.test_apply_aa_noise_probs_parity
Q9  timestep scale mismatch           -> test_q9 here
Q10 t in {0..T} inclusive             -> test_q10 here
Q11 loss = CE(noised)+ELBO            -> test_q11 here
Q12 per-epoch LR schedule             -> test_training.test_lr_schedule_matches_reference_shape
Q13 alphas recomputed per step        -> N/A (pure waste; we precompute — identical numerics)
Q14 val-loss logging bugs             -> N/A (observability only; our loop logs correctly)
"""

import numpy as np
import jax
import jax.numpy as jnp

from e3diff_tpu.data.dataset import FEATURE_NAMES
from e3diff_tpu.data.preprocessing import extract_angle_dihedrals
from e3diff_tpu.diffusion import D3PMDiffusion
from e3diff_tpu.ops import BlosumTransition


def test_q1_angle_columns_misnamed_but_consistent():
    """Preprocessing stores [omega, phi, psi, dihedral_o, theta1..theta_o];
    the dataset labels the same tensor [phi, psi, omega, ...]. The physical
    order must stay keyed to preprocessing insertion order."""
    rng = np.random.default_rng(0)
    base = np.cumsum(rng.normal(1.5, 0.2, (5, 3)), axis=0)
    coords = [{"N": b, "CA": b + [1.2, 0, 0], "C": b + [2.2, 0.8, 0],
               "O": b + [2.6, 1.9, 0.3]} for b in base]
    angles = extract_angle_dihedrals(coords)
    # insertion order is the behavioral contract
    assert list(angles[0].keys()) == [
        "omega", "phi", "psi", "dihedral_o",
        "theta1", "theta2", "theta3", "theta_o"]
    # ...while the dataset/reconstruction label that same order as:
    assert FEATURE_NAMES == ["phi", "psi", "omega", "dihedral_o",
                             "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"]


def test_q3_blosum_indexed_by_alpha_bar_inverts_noise_direction():
    """Small t (alpha_bar ~ 1) must map to NEAR-UNIFORM substitution and
    t = T (alpha_bar ~ 0) to near-identity — the inverted direction."""
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    q_t0 = np.asarray(d3pm.qt_bar_from_t_int(np.array([0])))[0]
    q_tT = np.asarray(d3pm.qt_bar_from_t_int(np.array([50])))[0]
    assert np.diag(q_t0).mean() < 0.15   # t=0: heavy substitution
    assert np.diag(q_tT).mean() > 0.99   # t=T: identity-like


def test_q7_receptor_uses_ligand_selayer_params():
    """The sequence denoiser must have NO receptor_feature_emb params —
    the receptor branch runs through the ligand SELayer instance."""
    from e3diff_tpu.models import SequenceDenoiser, sequence_model_configs

    enc, dec = sequence_model_configs(max_seq_len=16, num_layers=1)
    model = SequenceDenoiser(enc, dec)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1)),
        jnp.zeros((1, 16, 20)), jnp.zeros((1, 16, 8)), jnp.ones((1, 16)),
        jnp.zeros((1, 16, 20)), jnp.zeros((1, 16, 8)), jnp.ones((1, 16)),
    )["params"]
    assert "ligand_feature_emb" in params
    assert "receptor_feature_emb" not in params


def test_q9_model_accepts_both_timestep_scales():
    """Training conditions on t/T in [0,1]; sampling on raw integer steps.
    The model must embed both without shape games, and produce different
    outputs (the scales are NOT interchangeable — the trained weights
    absorbed the mismatch)."""
    from e3diff_tpu.models import SequenceDenoiser, sequence_model_configs

    enc, dec = sequence_model_configs(max_seq_len=16, num_layers=1)
    model = SequenceDenoiser(enc, dec)
    args = (jnp.zeros((2, 16, 20)), jnp.zeros((2, 16, 8)), jnp.ones((2, 16)),
            jnp.zeros((2, 16, 20)), jnp.zeros((2, 16, 8)), jnp.ones((2, 16)))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 1)), *args)["params"]
    out_norm = model.apply({"params": params}, jnp.full((2, 1), 0.5), *args)
    out_int = model.apply({"params": params}, jnp.full((2, 1), 25.0), *args)
    assert out_norm.shape == out_int.shape == (2, 16, 20)
    assert not np.allclose(np.asarray(out_norm), np.asarray(out_int))


def test_q10_training_samples_t_inclusive():
    """t must cover {0..T} inclusive (T+1 values)."""
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    draws = jax.random.randint(jax.random.PRNGKey(0), (20000,), 0,
                               d3pm.timesteps + 1)
    assert int(draws.max()) == 50 and int(draws.min()) == 0


def test_q11_loss_is_ce_noised_plus_elbo_only():
    """aa_all_loss (unnoised CE) is computed/logged but NOT in the total."""
    from e3diff_tpu.training import sequence_losses

    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.normal(size=(2, 8, 20)).astype(np.float32))
    lig = jnp.asarray(np.eye(20, dtype=np.float32)[rng.integers(0, 20, (2, 8))])
    noised = jnp.asarray(np.eye(20, dtype=np.float32)[rng.integers(0, 20, (2, 8))])
    mask = jnp.ones((2, 8))
    total, metrics = sequence_losses(pred, noised, lig, mask)
    np.testing.assert_allclose(
        float(total),
        float(metrics["aa_noised_loss"]) + float(metrics["elbo_loss"]),
        rtol=1e-6)
    assert "aa_all_loss" in metrics
