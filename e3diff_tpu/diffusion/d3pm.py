"""Discrete D3PM over amino-acid classes with BLOSUM/uniform transitions.

Forward process: reference PeptideDiff.apply_aa_noise
(sequence_model/model.py:291-311). Quirks preserved exactly (SURVEY.md):
  Q3 - the transition is indexed by alpha_bar(t), not t/T;
  Q8 - the transition is applied column-wise, prob = Q_bar @ x (for one-hot
       x selecting class j, prob_i = Q_bar[i, j] — a column, unnormalized;
       the categorical draw renormalizes);
  zero-probability rows (padded positions, x == 0) sample class 0.

Reverse process: reference denoise / sample_p_zs_given_zt_discrete /
compute_batched_over0_posterior_distribution (sequence_model/sample.py:
112-229), with the per-token Python multinomial loop replaced by one
jax.random.categorical over (B, L, K) — the single biggest idiomatic win
(SURVEY.md §7). The one-step transition is approximated as
row-normalize(Qsb / Qtb), matching the reference's explicit approximation,
and at the final step (s == 0) the raw prediction logits are returned.

Q9 is also kept: the model is conditioned on t/T during training but on the
raw integer step during sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from e3diff_tpu.ops.schedules import DiscreteNoiseSchedule


@dataclasses.dataclass(frozen=True)
class D3PMDiffusion:
    timesteps: int
    alphas_bar: jnp.ndarray        # (T+1,) device array
    transition: object             # BlosumTransition or UniformTransition
    num_classes: int = 20

    @classmethod
    def create(cls, transition, timesteps: int = 50, num_classes: int = 20):
        sched = DiscreteNoiseSchedule.cosine(timesteps)
        return cls(timesteps=timesteps,
                   alphas_bar=jnp.asarray(sched.alphas_bar),
                   transition=transition, num_classes=num_classes)

    # ---------------- forward (q) ----------------

    def qt_bar_from_t_int(self, t_int):
        """Q_bar(t) with the reference's alpha_bar indexing quirk (Q3):
        alpha_bar = schedule[round(t/T * T)] = schedule[t_int], then the
        transition maps alpha_bar through ITS OWN 0..500 ladder."""
        ab = self.alphas_bar[jnp.asarray(t_int, jnp.int32).reshape(-1)]
        return self.transition.get_Qt_bar(ab)

    def aa_noise_probs(self, ligand_seq, t_int):
        """Per-token (unnormalized) substitution probabilities.

        ligand_seq: (B, L, K) one-hot (all-zero rows at padding);
        t_int: (B,) integer steps in 0..T inclusive.
        Returns (B, L, K) with prob[b,l,i] = sum_j Qtb[b,i,j] x[b,l,j]
        (column orientation, quirk Q8).
        """
        qtb = self.qt_bar_from_t_int(t_int)            # (B, K, K)
        return jnp.einsum("bij,blj->bli", qtb, ligand_seq)

    def apply_aa_noise(self, key, ligand_seq, t_int):
        """Sample noised one-hots; zero-probability (padded) tokens -> class 0
        (reference sequence_model/model.py:304-309)."""
        probs = self.aa_noise_probs(ligand_seq, t_int)
        logits = jnp.log(jnp.maximum(probs, 1e-30))
        draws = jax.random.categorical(key, logits, axis=-1)
        draws = jnp.where(probs.sum(-1) > 0, draws, 0)
        return jax.nn.one_hot(draws, self.num_classes, dtype=ligand_seq.dtype)

    # ---------------- reverse (p) ----------------

    def posterior_probs(self, x_t, pred_logits, s_int, t_int=None):
        """p(x_s | x_t, model) for every token; s_int scalar step (the whole
        batch shares one step, as in the reference loop).

        Mirrors sample_p_zs_given_zt_discrete + compute_batched_over0_
        posterior_distribution with Q_t approximated by
        row-normalize(Qsb/Qtb). Returns (B, L, K) normalized probabilities.

        t_int defaults to s_int + 1 (the reference's adjacent step); a
        larger t generalizes the SAME ratio approximation to a multi-step
        jump s <- t, enabling skip sampling over a subsequence (the
        discrete analogue of DDIM; not in the reference).
        """
        b = x_t.shape[0]
        t_idx = jnp.full((b,), s_int + 1 if t_int is None else t_int,
                         jnp.int32)
        s_idx = jnp.full((b,), s_int, jnp.int32)
        # Q3: alpha_bar passed as the transition's "t_normal"
        qtb = self.transition.get_Qt_bar(self.alphas_bar[t_idx])   # (B,K,K)
        qsb = self.transition.get_Qt_bar(self.alphas_bar[s_idx])   # (B,K,K)
        ratio = qsb / qtb
        qt = ratio / ratio.sum(-1, keepdims=True)                  # (B,K,K)

        pred = jax.nn.softmax(pred_logits, axis=-1)                # (B,L,K)
        # left[b,l,k] = sum_j x_t[b,l,j] * qt[b,k,j]
        left = jnp.einsum("blj,bkj->blk", x_t, qt)                 # (B,L,Ks)
        numerator = left[:, :, None, :] * qsb[:, None, :, :]       # (B,L,K0,Ks)
        denom = jnp.einsum("bij,blj->bli", qtb, x_t)               # (B,L,K0)
        denom = jnp.where(denom == 0, 1e-6, denom)
        posterior = numerator / denom[..., None]                   # (B,L,K0,Ks)
        weighted = pred[..., None] * posterior
        unnorm = weighted.sum(axis=2)                              # (B,L,Ks)
        rowsum = unnorm.sum(-1, keepdims=True)
        unnorm = jnp.where(rowsum == 0, 1e-5, unnorm)
        return unnorm / unnorm.sum(-1, keepdims=True)

    def posterior_sample(self, key, x_t, pred_logits, s_int,
                         diverse: bool = True, t_int=None):
        probs = self.posterior_probs(x_t, pred_logits, s_int, t_int)
        if diverse:
            draws = jax.random.categorical(key, jnp.log(probs), axis=-1)
        else:
            draws = jnp.argmax(probs, axis=-1)
        return jax.nn.one_hot(draws, self.num_classes, dtype=x_t.dtype)

    def init_noise(self, key, batch_size: int, length: int, dtype=jnp.float32):
        """Uniform random one-hots (generate_discrete_noise,
        sequence_model/sample.py:112-116)."""
        idx = jax.random.randint(key, (batch_size, length), 0, self.num_classes)
        return jax.nn.one_hot(idx, self.num_classes, dtype=dtype)

    def sample_loop(
        self,
        denoise_fn: Callable,   # (timestep_float_(B,1), x_onehot) -> logits
        key,
        x_init,                 # (B, L, K) one-hot noise
        *,
        diverse: bool = True,
        n_steps: int | None = None,
    ):
        """Reverse loop for s = T-1 .. 0 as lax.scan; at s == 0 the model's
        raw logits are the output (argmax downstream), reference semantics.

        The model timestep is the raw integer step s (quirk Q9).

        n_steps < T runs a skip loop over an evenly spaced descending
        subsequence of steps: each update jumps x_t -> x_s with the same
        ratio-approximated transition evaluated at the (s, t) pair — the
        discrete analogue of DDIM (default None = every step,
        reference-faithful)."""
        b = x_init.shape[0]
        if n_steps is None or n_steps >= self.timesteps - 1:
            s_values = jnp.arange(self.timesteps - 1, 0, -1,
                                  dtype=jnp.int32)
            t_values = s_values + 1
        else:
            ladder = np.round(np.linspace(self.timesteps - 1, 1,
                                          max(n_steps, 1))
                              ).astype(np.int32)
            # the first model call sees x_init at its marginal step T-1;
            # each jump then lands on the next ladder entry
            s_values = jnp.asarray(ladder)
            t_values = jnp.asarray(
                np.concatenate([[self.timesteps], ladder[:-1] + 0]))

        def body(carry, pair):
            x, k = carry
            s_scalar, t_scalar = pair
            k, k_step = jax.random.split(k)
            s_arr = jnp.full((b, 1), s_scalar, x_init.dtype)
            logits = denoise_fn(s_arr, x)
            x = self.posterior_sample(k_step, x, logits, s_scalar, diverse,
                                      t_int=t_scalar)
            return (x, k), None

        (x, key), _ = jax.lax.scan(body, (x_init, key),
                                   (s_values, t_values))
        # final step s == 0: return raw prediction logits
        final_logits = denoise_fn(jnp.zeros((b, 1), x_init.dtype), x)
        return final_logits
