from e3diff_tpu.diffusion.gaussian import (
    GaussianAngleDiffusion,
    sample_wrapped_noise,
)
from e3diff_tpu.diffusion.d3pm import D3PMDiffusion

__all__ = ["GaussianAngleDiffusion", "sample_wrapped_noise", "D3PMDiffusion"]
