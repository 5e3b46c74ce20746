"""Pure numerical building blocks (no model state, no IO).

Host-side schedule precomputation lives here as NumPy; everything consumed
inside jit is returned as plain arrays that callers move to device once.
"""

from e3diff_tpu.ops.schedules import (
    cosine_beta_schedule,
    compute_alphas,
    cosine_beta_schedule_discrete,
    custom_beta_schedule_discrete,
    cosine_alpha_bar_schedule,
    DiscreteNoiseSchedule,
    GammaNoiseSchedule,
)
from e3diff_tpu.ops.angles import (
    wrap_angle,
    radian_l1_loss,
    radian_smooth_l1_loss,
    tolerant_comparison_check,
)
from e3diff_tpu.ops.transitions import (
    UniformTransition,
    BlosumTransition,
    load_blosum_asset,
)
from e3diff_tpu.ops.elbo import elbo_loss

__all__ = [
    "cosine_beta_schedule",
    "compute_alphas",
    "cosine_beta_schedule_discrete",
    "custom_beta_schedule_discrete",
    "cosine_alpha_bar_schedule",
    "DiscreteNoiseSchedule",
    "GammaNoiseSchedule",
    "wrap_angle",
    "radian_l1_loss",
    "radian_smooth_l1_loss",
    "tolerant_comparison_check",
    "UniformTransition",
    "BlosumTransition",
    "load_blosum_asset",
    "elbo_loss",
]
