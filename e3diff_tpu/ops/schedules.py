"""Diffusion noise schedules.

Replicates the reference's two schedule families to numerical tolerance
(golden values in BASELINE.md):

* continuous cosine beta schedule (Nichol & Dhariwal) used by the structure
  (angle) DDPM — reference: structure_model/utils.py:9-59.
* discrete cosine beta schedule producing T+1 betas used by the sequence
  D3PM — reference: sequence_model/utils.py:99-108, 206-233.

Schedules are tiny and precomputed host-side in NumPy; the returned arrays
are float32 so they can be closed over by jitted functions as constants or
passed in as device arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 8e-3) -> np.ndarray:
    """Nichol-Dhariwal cosine schedule, clipped to [1e-4, 0.9999].

    Matches structure_model/utils.py:9-18 (computed there in torch float32;
    we compute in float64 and cast, which agrees to <1e-7 relative).
    Returns betas of shape (timesteps,).
    """
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999).astype(np.float32)


def compute_alphas(betas: np.ndarray) -> dict[str, np.ndarray]:
    """Derived alpha terms for the DDPM forward/reverse processes.

    Matches structure_model/utils.py:42-59. All outputs float32,
    shape (T,).
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    out = {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "posterior_variance": posterior_variance,
        "sqrt_recip_alphas": 1.0 / np.sqrt(alphas),
        "sqrt_posterior_variance": np.sqrt(posterior_variance),
    }
    return {k: v.astype(np.float32) for k, v in out.items()}


def cosine_beta_schedule_discrete(timesteps: int, s: float = 8e-3) -> np.ndarray:
    """Discrete cosine schedule producing **timesteps + 1** betas.

    Matches sequence_model/utils.py:99-108: steps = T + 2 points spanning
    [0, T+2] (note the reference's linspace covers 0..steps with `steps`
    points, i.e. spacing (T+2)/(T+1)); the last beta is 1.0.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(0.5 * np.pi * ((x / steps) + s) / (1 + s)) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    alphas = alphas_cumprod[1:] / alphas_cumprod[:-1]
    betas = 1 - alphas
    return betas.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class DiscreteNoiseSchedule:
    """Lookup-table discrete noise schedule for the sequence D3PM.

    Matches PredefinedNoiseScheduleDiscrete (sequence_model/utils.py:206-233):
    betas are clamped to <=0.9999 before the cumulative product, and
    alpha_bar is computed as exp(cumsum(log(alpha))) in float32 to reproduce
    the reference bit pattern (alphas_bar[0]=0.9983054, [T]=9.33647e-8 for
    T=50).

    Index by integer step in [0, T] or by t_normalized in [0, 1]
    (rounded to the nearest index, like the reference).
    """

    timesteps: int
    betas: np.ndarray        # (T+1,)
    alphas: np.ndarray       # (T+1,)
    alphas_bar: np.ndarray   # (T+1,)

    @classmethod
    def cosine(cls, timesteps: int) -> "DiscreteNoiseSchedule":
        betas = cosine_beta_schedule_discrete(timesteps)
        alphas = (1.0 - np.clip(betas, 0.0, 0.9999)).astype(np.float32)
        log_alpha_bar = np.cumsum(np.log(alphas.astype(np.float32)))
        alphas_bar = np.exp(log_alpha_bar).astype(np.float32)
        return cls(timesteps=timesteps, betas=betas, alphas=alphas, alphas_bar=alphas_bar)

    def t_int_of(self, t_normalized):
        """Round normalized time to the lookup index (reference semantics)."""
        return np.round(np.asarray(t_normalized) * self.timesteps).astype(np.int32)

    def beta(self, *, t_normalized=None, t_int=None):
        idx = self.t_int_of(t_normalized) if t_int is None else np.asarray(t_int)
        return self.betas[idx]

    def alpha_bar(self, *, t_normalized=None, t_int=None):
        idx = self.t_int_of(t_normalized) if t_int is None else np.asarray(t_int)
        return self.alphas_bar[idx]


def cosine_alpha_bar_schedule(timesteps: int, s: float = 8e-3,
                              raise_to_power: float = 1.0) -> np.ndarray:
    """Continuous cosine schedule returning alphas_cumprod of shape
    (timesteps + 1,), betas clipped to [0, 0.999].

    Matches sequence_model/utils.py:80-97 (`cosine_beta_schedule` there —
    misnamed: it returns cumulative alphas, not betas). Unused by the
    reference training/sampling paths; kept for parity with the
    GammaNoiseSchedule below.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = np.clip(1 - alphas_cumprod[1:] / alphas_cumprod[:-1], 0, 0.999)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class GammaNoiseSchedule:
    """Continuous-gamma lookup schedule: gamma(t) = -log(alpha^2/sigma^2).

    Parity port of the reference's unused `PredefinedNoiseSchedule`
    (sequence_model/utils.py:180-204) — the VDM-style signal-to-noise
    parameterization GraDe-IF inherited but never wired into training.
    Kept so every reference symbol has an equivalent here.
    """

    timesteps: int
    gamma: np.ndarray  # (timesteps + 1,)

    @classmethod
    def cosine(cls, timesteps: int) -> "GammaNoiseSchedule":
        alphas2 = cosine_alpha_bar_schedule(timesteps).astype(np.float64)
        sigmas2 = 1.0 - alphas2
        gamma = -(np.log(alphas2) - np.log(sigmas2))
        return cls(timesteps=timesteps, gamma=gamma.astype(np.float32))

    def __call__(self, t_normalized):
        idx = np.round(
            np.asarray(t_normalized) * self.timesteps).astype(np.int64)
        return self.gamma[idx]


def custom_beta_schedule_discrete(timesteps: int, average_num_nodes: int = 50,
                                  s: float = 8e-3) -> np.ndarray:
    """Discrete cosine schedule with a floor on the first ~100 betas.

    Parity port of sequence_model/utils.py:110-130 (dead code there — a
    GraDe-IF graph-diffusion leftover sizing the floor by expected edge
    count; no caller in the reference).
    """
    assert timesteps >= 100
    betas = cosine_beta_schedule_discrete(timesteps, s).astype(np.float64)
    p = 4 / 5  # 1 - 1 / num_edge_classes
    num_edges = average_num_nodes * (average_num_nodes - 1) / 2
    beta_first = 1.2 / (p * num_edges)
    betas[betas < beta_first] = beta_first
    return betas.astype(np.float32)
