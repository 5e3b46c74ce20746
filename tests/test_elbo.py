"""Parity test for the nonstandard ELBO loss vs the reference torch formula."""

import jax.numpy as jnp
import numpy as np


def _torch_reference_elbo(logits1, logits2, eps=1e-6):
    import torch
    import torch.nn.functional as F

    logits1 = torch.tensor(logits1)
    logits2 = torch.tensor(logits2)
    probs1 = F.softmax(logits1, dim=-1)
    probs2 = F.softmax(logits2, dim=-1)
    log_probs1 = F.log_softmax(logits1 + eps, dim=-1)
    kl_div = F.kl_div(log_probs1, probs2, reduction="batchmean")
    nll = -torch.mean(torch.sum(probs1 * log_probs1, dim=-1))
    return float(nll + kl_div)


def test_elbo_parity_unmasked():
    from e3diff_tpu.ops import elbo_loss

    rng = np.random.default_rng(2)
    pred = rng.normal(size=(12, 20)).astype(np.float32)
    onehot = np.eye(20, dtype=np.float32)[rng.integers(0, 20, 12)]
    got = float(elbo_loss(jnp.asarray(pred), jnp.asarray(onehot)))
    want = _torch_reference_elbo(pred, onehot)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_elbo_masked_equals_boolean_indexed():
    from e3diff_tpu.ops import elbo_loss

    rng = np.random.default_rng(3)
    pred = rng.normal(size=(4, 8, 20)).astype(np.float32)
    onehot = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (4, 8))]
    mask = rng.random((4, 8)) > 0.5

    got = float(elbo_loss(jnp.asarray(pred), jnp.asarray(onehot), mask=jnp.asarray(mask)))
    want = _torch_reference_elbo(pred[mask], onehot[mask])
    np.testing.assert_allclose(got, want, rtol=1e-5)
