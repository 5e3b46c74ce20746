from e3diff_tpu.diffusion.gaussian import (
    GaussianAngleDiffusion,
    sample_wrapped_noise,
)
from e3diff_tpu.diffusion.d3pm import D3PMDiffusion
from e3diff_tpu.diffusion.guidance import (
    concat_cond_uncond,
    drop_conditioning,
    guided_combine,
    null_receptor,
)

__all__ = ["GaussianAngleDiffusion", "sample_wrapped_noise", "D3PMDiffusion",
           "concat_cond_uncond", "drop_conditioning", "guided_combine",
           "null_receptor"]
