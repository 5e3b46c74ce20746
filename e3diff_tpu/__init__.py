"""e3diff_tpu — TPU-native JAX framework for pocket-conditioned peptide diffusion.

A ground-up rebuild of the capabilities of LabJunBMI/E3-invaraint-diffusion-model
(see /root/repo/SURVEY.md): a continuous DDPM over 8 backbone torsion/bond angles
(FoldingDiff lineage) and a discrete D3PM over 20 amino-acid classes with a BLOSUM
substitution transition kernel (GraDe-IF lineage), both denoised by transformer
encoder-decoder networks cross-attending to the protein binding pocket — plus the
BioLiP preprocessing pipeline, NERF angle-to-coordinate reconstruction with PDB
output, and the end-to-end sample-angles -> build-structure -> inverse-fold loop.

Everything on the compute path is idiomatic JAX: jit-compiled `lax.scan` samplers,
in-step PRNG-driven noising, fixed-shape bucketed padding, `jax.random.categorical`
instead of per-token loops, and data/tensor-parallel sharding over a
`jax.sharding.Mesh` for TPU scale-out.

Subpackages
-----------
ops        pure numerical functions: schedules, wrapped-angle math, radian losses,
           D3PM transition kernels (uniform + BLOSUM), ELBO
models     flax.linen denoiser networks (SELayer/adaLN blocks, relative_key
           transformer encoder-decoder, prediction heads)
diffusion  forward noising + reverse samplers (continuous DDPM, discrete D3PM)
data       BioLiP preprocessing, dataset/splits/pocket-extension, batching
geometry   NERF coordinate reconstruction, PDB writing
training   jitted train steps, optimizer/schedule, orbax checkpointing, metrics
sampling   scan-based samplers + end-to-end pipeline drivers
parallel   mesh construction and sharding rules (dp/tp over ICI)
utils      config system, small helpers
"""

__version__ = "0.1.0"
