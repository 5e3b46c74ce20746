"""Golden-value tests for noise schedules (values from BASELINE.md, measured
from the reference implementation on CPU)."""

import numpy as np

from e3diff_tpu.ops import (
    cosine_beta_schedule,
    compute_alphas,
    cosine_beta_schedule_discrete,
    DiscreteNoiseSchedule,
)


def test_structure_cosine_schedule_golden():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.dtype == np.float32
    np.testing.assert_allclose(betas[0], 1.0000e-4, rtol=1e-4)
    np.testing.assert_allclose(betas[500], 3.1558e-3, rtol=1e-3)
    np.testing.assert_allclose(betas[999], 0.9999, rtol=1e-6)


def test_structure_alphas_golden():
    terms = compute_alphas(cosine_beta_schedule(1000))
    ac = terms["alphas_cumprod"]
    np.testing.assert_allclose(ac[0], 0.99990, rtol=1e-5)
    np.testing.assert_allclose(ac[500], 0.4920960, rtol=1e-5)
    np.testing.assert_allclose(ac[999], 2.42839e-10, rtol=1e-3)
    # posterior variance sanity: non-negative, first entry 0
    pv = terms["posterior_variance"]
    assert pv[0] == 0.0
    assert np.all(pv >= 0)
    np.testing.assert_allclose(
        terms["sqrt_one_minus_alphas_cumprod"] ** 2 + terms["sqrt_alphas_cumprod"] ** 2,
        1.0, atol=1e-6)


def test_discrete_schedule_golden():
    betas = cosine_beta_schedule_discrete(50)
    assert betas.shape == (51,)
    np.testing.assert_allclose(betas[0], 1.69462e-3, rtol=1e-4)
    np.testing.assert_allclose(betas[50], 1.0, rtol=1e-6)

    sched = DiscreteNoiseSchedule.cosine(50)
    np.testing.assert_allclose(sched.alphas_bar[0], 0.9983054, rtol=1e-5)
    np.testing.assert_allclose(sched.alphas_bar[25], 0.4785699, rtol=1e-5)
    np.testing.assert_allclose(sched.alphas_bar[50], 9.33647e-8, rtol=1e-3)


def test_discrete_schedule_lookup_by_normalized_t():
    sched = DiscreteNoiseSchedule.cosine(50)
    # t_normalized rounds to the nearest index, reference semantics
    np.testing.assert_allclose(sched.alpha_bar(t_normalized=0.5), sched.alphas_bar[25])
    np.testing.assert_allclose(sched.alpha_bar(t_int=50), sched.alphas_bar[50])
    np.testing.assert_allclose(sched.beta(t_normalized=np.array([0.0, 1.0])),
                               sched.betas[[0, 50]])


def test_gamma_noise_schedule_parity_vs_reference():
    """GammaNoiseSchedule == the reference's unused PredefinedNoiseSchedule
    (sequence_model/utils.py:180-204) over every lookup index."""
    import torch
    from reference_compat import load_reference_module

    from e3diff_tpu.ops.schedules import GammaNoiseSchedule

    ref_utils = load_reference_module("sequence_model", "utils")
    ref = ref_utils.PredefinedNoiseSchedule("cosine", timesteps=50)
    ours = GammaNoiseSchedule.cosine(50)
    assert ours.gamma.shape == tuple(ref.gamma.shape)
    t = np.linspace(0.0, 1.0, 51)
    want = ref(torch.tensor(t)).numpy()
    np.testing.assert_allclose(ours(t), want, rtol=2e-5)


def test_custom_beta_schedule_discrete_parity_vs_reference():
    from reference_compat import load_reference_module

    from e3diff_tpu.ops.schedules import custom_beta_schedule_discrete

    ref_utils = load_reference_module("sequence_model", "utils")
    want = ref_utils.custom_beta_schedule_discrete(120)
    got = custom_beta_schedule_discrete(120)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)
