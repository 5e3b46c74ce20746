"""Parity tests for the diffusion processes vs reference torch code
(loaded read-only from /root/reference)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e3diff_tpu.diffusion import GaussianAngleDiffusion, D3PMDiffusion  # noqa: E402
from e3diff_tpu.ops import BlosumTransition  # noqa: E402
from tests.reference_compat import load_reference_module  # noqa: E402


def test_q_sample_parity():
    """Forward noising x_t = wrap(sqrt(ab) x0 + sqrt(1-ab) eps) matches the
    reference dataset wrapper given identical noise."""
    ref_utils = load_reference_module("structure_model", "utils")
    betas = ref_utils.cosine_beta_schedule(1000)
    terms = ref_utils.compute_alphas(betas)

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-np.pi, np.pi, size=(3, 16, 8)).astype(np.float32)
    noise = rng.normal(size=(3, 16, 8)).astype(np.float32)
    t = np.array([0, 500, 999])

    diff = GaussianAngleDiffusion.cosine(1000)
    got = np.asarray(diff.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))

    for i, ti in enumerate(t):
        sac = terms["sqrt_alphas_cumprod"][ti]
        somac = terms["sqrt_one_minus_alphas_cumprod"][ti]
        want = ref_utils.modulo_with_wrapped_range(
            sac * torch.tensor(x0[i]) + somac * torch.tensor(noise[i]),
            -np.pi, np.pi).numpy()
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_p_sample_mean_parity(monkeypatch):
    """Reverse-step mean matches reference p_sample with the gaussian term
    zeroed (torch.randn_like patched to zeros) and a stubbed model."""
    ref_sample = _load_structure_sample()
    ref_utils = load_reference_module("structure_model", "utils")

    rng = np.random.default_rng(1)
    x = rng.uniform(-np.pi, np.pi, size=(2, 8, 8)).astype(np.float32)
    eps = rng.normal(size=(2, 8, 8)).astype(np.float32)
    betas = ref_utils.cosine_beta_schedule(1000)

    monkeypatch.setattr(torch, "randn_like", lambda v: torch.zeros_like(v))

    diff = GaussianAngleDiffusion.cosine(1000)
    for t_index in [0, 37, 999]:
        t_vec = torch.full((2,), t_index, dtype=torch.long)
        model = lambda *a, **k: torch.tensor(eps)
        want = ref_sample.p_sample(
            model, None, torch.tensor(x), None, None, None,
            timestep=t_vec, betas=betas).numpy()

        t_jnp = jnp.full((2,), t_index, jnp.int32)
        mean = diff.p_mean(jnp.asarray(x), jnp.asarray(eps), t_jnp)
        np.testing.assert_allclose(np.asarray(mean), want, atol=2e-5, rtol=1e-4)


def _load_structure_sample():
    """structure_model/sample.py sets a cuda device at module level; patch
    around that."""
    cuda_set_device = torch.cuda.set_device
    torch.cuda.set_device = lambda *_: None
    try:
        mod = load_reference_module("structure_model", "sample")
    finally:
        torch.cuda.set_device = cuda_set_device
    mod.DEVICE = torch.device("cpu")
    return mod


def _load_sequence_sample():
    import sys
    import types

    if "torch_geometric.loader" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        loader = types.ModuleType("torch_geometric.loader")
        from torch.utils.data import DataLoader
        loader.DataLoader = DataLoader
        tg.loader = loader
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.loader"] = loader
    mod = load_reference_module("sequence_model", "sample")
    mod.DEVICE = torch.device("cpu")
    return mod


@pytest.fixture()
def ref_seq_objects():
    """Reference discrete schedule + BLOSUM transition, constructed on CPU
    (BlosumTransition resolves its asset path relative to cwd)."""
    ref_utils = load_reference_module("sequence_model", "utils")
    cwd = os.getcwd()
    os.chdir("/root/reference/sequence_model")
    try:
        transition = ref_utils.BlosumTransition(x_classes=20)
    finally:
        os.chdir(cwd)
    schedule = ref_utils.PredefinedNoiseScheduleDiscrete("cosine", 50)
    return schedule, transition


def test_apply_aa_noise_probs_parity(ref_seq_objects):
    """Forward D3PM probs: Qt_bar @ x column-orientation (Q8) with alpha_bar
    indexing (Q3) matches the reference computation."""
    schedule, ref_transition = ref_seq_objects
    rng = np.random.default_rng(2)
    B, L = 3, 8
    classes = rng.integers(0, 20, (B, L))
    x = np.eye(20, dtype=np.float32)[classes]
    x[1, 5:] = 0.0  # padded tokens
    t_int = np.array([0, 25, 50])

    # reference-side: alpha_bar -> Qtb -> Qtb @ x (sequence_model/model.py:298-301)
    ab = schedule.get_alpha_bar(t_int=torch.tensor(t_int))
    qtb = ref_transition.get_Qt_bar(ab.unsqueeze(1), torch.device("cpu"))
    xt = torch.tensor(x).reshape(B * L, 20)
    rep = torch.arange(B).repeat_interleave(L)
    want = (qtb[rep] @ xt.unsqueeze(2)).squeeze(-1).reshape(B, L, 20).numpy()

    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    got = np.asarray(d3pm.aa_noise_probs(jnp.asarray(x), jnp.asarray(t_int)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_apply_aa_noise_padding_goes_to_class0():
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    x = np.zeros((1, 4, 20), np.float32)
    x[0, 0, 7] = 1.0  # only token 0 is real
    out = np.asarray(d3pm.apply_aa_noise(jax.random.PRNGKey(0), jnp.asarray(x),
                                         jnp.asarray([10])))
    assert out.shape == (1, 4, 20)
    np.testing.assert_array_equal(out[0, 1:].argmax(-1), 0)
    np.testing.assert_array_equal(out[0, 1:, 0], 1.0)


def test_posterior_sampler_parity_argmax(ref_seq_objects):
    """Black-box parity of the D3PM posterior with the reference
    sample_p_zs_given_zt_discrete (diverse=False => deterministic argmax)."""
    schedule, ref_transition = ref_seq_objects
    ref_sample = _load_sequence_sample()

    rng = np.random.default_rng(3)
    B, L, K = 2, 6, 20
    x_t = np.eye(K, dtype=np.float32)[rng.integers(0, K, (B, L))]
    pred = rng.normal(size=(B, L, K)).astype(np.float32)

    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)

    for s_int in [48, 20, 1]:
        t_norm = torch.full((B, 1), (s_int + 1) / 50.0)
        s_norm = torch.full((B, 1), s_int / 50.0)
        want = ref_sample.sample_p_zs_given_zt_discrete(
            t_norm, s_norm, torch.tensor(x_t), torch.tensor(pred),
            schedule, ref_transition, diverse=False, is_last_step=False).numpy()

        got = np.asarray(d3pm.posterior_sample(
            jax.random.PRNGKey(0), jnp.asarray(x_t), jnp.asarray(pred),
            s_int, diverse=False))
        np.testing.assert_array_equal(got, want)


def _reference_posterior_probs(ref_sample, schedule, transition, x_t, pred,
                               s_int, timesteps=50):
    """The normalized posterior tensor of sample_p_zs_given_zt_discrete
    (sequence_model/sample.py:141-167) up to — not including — the RNG
    draw, built from the reference's own helpers."""
    import torch.nn.functional as F

    B, L, K = x_t.shape
    t_norm = torch.full((B, 1), (s_int + 1) / timesteps)
    s_norm = torch.full((B, 1), s_int / timesteps)
    repeat_idx = torch.arange(B).repeat_interleave(L)
    xt_flat = torch.tensor(x_t).reshape(B * L, K)
    pred_flat = torch.tensor(pred).reshape(B * L, K)
    ab_t = schedule.get_alpha_bar(t_normalized=t_norm)
    ab_s = schedule.get_alpha_bar(t_normalized=s_norm)
    Qtb = transition.get_Qt_bar(ab_t, torch.device("cpu"))
    Qsb = transition.get_Qt_bar(ab_s, torch.device("cpu"))
    Qt = (Qsb / Qtb) / (Qsb / Qtb).sum(dim=-1).unsqueeze(dim=2)
    pred_X = F.softmax(pred_flat, dim=-1)
    post = ref_sample.compute_batched_over0_posterior_distribution(
        X_t=xt_flat, Q_t=Qt, Qsb=Qsb, Qtb=Qtb, batch=repeat_idx)
    weighted = pred_X.unsqueeze(-1) * post
    unnorm = weighted.sum(dim=1)
    unnorm[torch.sum(unnorm, dim=-1) == 0] = 1e-5
    prob = unnorm / torch.sum(unnorm, dim=-1, keepdim=True)
    return prob.reshape(B, L, K).numpy()


def test_posterior_probability_tensor_parity_all_steps(ref_seq_objects):
    """The diverse=True path's distribution, pinned directly: the normalized
    posterior probability tensor matches the reference to <=1e-6 for EVERY
    s in {T-1 .. 1} (VERDICT r1 item 4). The RNG draw itself legitimately
    differs (jax.random.categorical vs per-token torch multinomial)."""
    schedule, ref_transition = ref_seq_objects
    ref_sample = _load_sequence_sample()

    rng = np.random.default_rng(7)
    B, L, K = 3, 6, 20
    x_t = np.eye(K, dtype=np.float32)[rng.integers(0, K, (B, L))]
    pred = (3.0 * rng.normal(size=(B, L, K))).astype(np.float32)

    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    probs_fn = jax.jit(d3pm.posterior_probs, static_argnums=2)
    worst = 0.0
    for s_int in range(49, 0, -1):
        want = _reference_posterior_probs(
            ref_sample, schedule, ref_transition, x_t, pred, s_int)
        got = np.asarray(probs_fn(jnp.asarray(x_t), jnp.asarray(pred), s_int))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0,
                                   err_msg=f"s={s_int}")
        worst = max(worst, np.abs(got - want).max())
    assert worst <= 1e-6


def test_posterior_probability_tensor_parity_uniform(ref_seq_objects):
    """Same pin for the uniform transition (the end-to-end pipeline's
    transition, sample_by_generated_angles.py:253)."""
    from e3diff_tpu.ops import UniformTransition

    schedule, _ = ref_seq_objects
    ref_utils = load_reference_module("sequence_model", "utils")
    ref_sample = _load_sequence_sample()
    ref_transition = ref_utils.DiscreteUniformTransition(x_classes=20)

    rng = np.random.default_rng(8)
    B, L, K = 2, 5, 20
    x_t = np.eye(K, dtype=np.float32)[rng.integers(0, K, (B, L))]
    pred = rng.normal(size=(B, L, K)).astype(np.float32)

    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=50)
    for s_int in [49, 25, 10, 1]:
        want = _reference_posterior_probs(
            ref_sample, schedule, ref_transition, x_t, pred, s_int)
        got = np.asarray(d3pm.posterior_probs(
            jnp.asarray(x_t), jnp.asarray(pred), s_int))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0,
                                   err_msg=f"s={s_int}")


def test_gaussian_sample_loop_shapes():
    diff = GaussianAngleDiffusion.cosine(20)
    x0 = sample_init = jnp.zeros((2, 8, 8))
    denoise = lambda t, x: jnp.zeros_like(x)
    final, traj = diff.sample_loop(denoise, jax.random.PRNGKey(0),
                                   sample_init, return_trajectory=True)
    assert final.shape == (2, 8, 8)
    assert traj.shape == (20, 2, 8, 8)
    assert np.all(np.abs(np.asarray(final)) <= np.pi + 1e-5)
    # trajectory index 0 is the first (t = T-1) step, last is the final sample
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))


def test_gaussian_sample_loop_trajectory_dtype():
    """trajectory_dtype downcasts only the stored trajectory; the carried
    sample stays full precision and bit-matches the default run."""
    diff = GaussianAngleDiffusion.cosine(10)
    x0 = jnp.zeros((2, 8, 8))
    denoise = lambda t, x: jnp.zeros_like(x)
    final_a, traj_a = diff.sample_loop(denoise, jax.random.PRNGKey(5), x0,
                                       return_trajectory=True)
    final_b, traj_b = diff.sample_loop(denoise, jax.random.PRNGKey(5), x0,
                                       return_trajectory=True,
                                       trajectory_dtype=jnp.bfloat16)
    assert traj_b.dtype == jnp.bfloat16
    assert final_b.dtype == final_a.dtype
    np.testing.assert_array_equal(np.asarray(final_a), np.asarray(final_b))
    np.testing.assert_allclose(np.asarray(traj_a),
                               np.asarray(traj_b, dtype=np.float32),
                               atol=0.02)


def test_d3pm_sample_loop_shapes():
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=10)
    x = d3pm.init_noise(jax.random.PRNGKey(1), 2, 6)
    assert np.allclose(np.asarray(x).sum(-1), 1.0)
    denoise = lambda s, xt: jnp.ones((2, 6, 20)) * jnp.arange(20)
    logits = d3pm.sample_loop(denoise, jax.random.PRNGKey(2), x)
    assert logits.shape == (2, 6, 20)
    assert np.asarray(logits.argmax(-1)).max() == 19
