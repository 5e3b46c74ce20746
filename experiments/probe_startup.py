import sys; sys.path.insert(0, "/root/repo")
import time
from e3diff_tpu.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import jax as _j; _j.config.update("jax_explain_cache_misses", True)
import jax, jax.numpy as jnp, numpy as np
from e3diff_tpu.diffusion import GaussianAngleDiffusion
from e3diff_tpu.models import StructureDenoiser, structure_model_configs
from e3diff_tpu.sampling.structure import make_structure_sampler
b, l, l_lig, t_steps = 32, 64, 16, 1000
enc_cfg, dec_cfg = structure_model_configs(max_seq_len=l, dtype=jnp.bfloat16)
model = StructureDenoiser(enc_cfg, dec_cfg)
diffusion = GaussianAngleDiffusion.cosine(t_steps)
rng = np.random.default_rng(0)
jbatch = {"ligand_angles": jnp.zeros((b, l_lig, 8)), "ligand_attn_mask": jnp.ones((b, l_lig)),
 "receptor_seq": jnp.asarray(np.eye(20, dtype=np.float32)[rng.integers(0,20,(b,l))]),
 "receptor_angles": jnp.asarray(rng.uniform(-np.pi,np.pi,(b,l,8)).astype(np.float32)),
 "receptor_attn_mask": jnp.ones((b, l))}
t0=time.time()
init_fn = jax.jit(model.init)
params = init_fn(jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
 jbatch["ligand_angles"], jbatch["ligand_attn_mask"], jbatch["receptor_seq"],
 jbatch["receptor_angles"], jbatch["receptor_attn_mask"])["params"]
jax.block_until_ready(params); print("jit(model.init)", round(time.time()-t0,1)); t0=time.time()
sampler = make_structure_sampler(model, diffusion, step=1, return_trajectory=False)
final, _ = sampler(params, jbatch, jax.random.PRNGKey(1))
print(float(jnp.sum(final)))
print("first call+sync", round(time.time()-t0,1)); t0=time.time()
final, _ = sampler(params, jbatch, jax.random.PRNGKey(2)); print(float(jnp.sum(final)))
print("second call", round(time.time()-t0,1))
