"""ELBO loss for the sequence D3PM.

Port of elbo_loss (sequence_model/utils.py:132-161). The reference's
formulation is nonstandard and replicated exactly (SURVEY.md quirk Q11):
the "target" is a one-hot that gets softmaxed, the NLL term is the entropy
of the prediction, and the KL uses torch's kl_div(log_p, q, 'batchmean')
convention = sum(q * (log q - log p)) / N over rows.

The reference applies this to rows selected by a boolean mask
(model.py:338); here the mask is an explicit argument so shapes stay static
under jit — the value matches boolean-index-then-batchmean.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def elbo_loss(logits_pred, logits_target, mask=None, eps: float = 1e-6):
    """NLL(pred entropy) + KL(softmax(target) || softmax(pred)).

    logits_pred/logits_target: (..., K). mask: broadcastable to the leading
    dims (rows); when given, row terms are summed over masked rows and
    divided by the masked count (batchmean over selected rows).
    """
    probs1 = jax.nn.softmax(logits_pred, axis=-1)
    probs2 = jax.nn.softmax(logits_target, axis=-1)
    log_probs1 = jax.nn.log_softmax(logits_pred + eps, axis=-1)
    log_probs2 = jnp.log(probs2)

    kl_row = jnp.sum(probs2 * (log_probs2 - log_probs1), axis=-1)
    nll_row = -jnp.sum(probs1 * log_probs1, axis=-1)

    if mask is None:
        n = kl_row.size
        return jnp.sum(kl_row) / n + jnp.mean(nll_row)
    m = mask.astype(kl_row.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(kl_row * m) / n + jnp.sum(nll_row * m) / n
