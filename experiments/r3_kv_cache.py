"""A/B: decoder cross-attention k/v cached across the reverse scan vs
re-projected every step (round-3 sampler optimization).

The pocket encoding is timestep-independent, so each decoder layer's
cross-attention k = enc_out @ Wk and v = enc_out @ Wv are loop-invariant;
at lig-bucket 16 / receptor 64 those two 64-token projections are ~47% of
the per-layer decoder matmul FLOPs. This measures the headline config
(146M, bf16, T=1000, no trajectory) both ways on the real chip.

Usage: python experiments/r3_kv_cache.py [--batches 32,64]
Appends JSON lines to experiments/r3_results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e3diff_tpu.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from e3diff_tpu.diffusion import GaussianAngleDiffusion
from e3diff_tpu.models import StructureDenoiser, structure_model_configs
from e3diff_tpu.sampling.structure import make_structure_sampler
from e3diff_tpu.diffusion.gaussian import sample_wrapped_noise

L_REC, L_LIG, T = 64, 16, 1000
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_results.jsonl")


def make_batch(b):
    rng = np.random.default_rng(0)
    return {
        "ligand_angles": jnp.zeros((b, L_LIG, 8), jnp.float32),
        "ligand_attn_mask": jnp.ones((b, L_LIG), jnp.float32),
        "receptor_seq": jnp.asarray(np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, L_REC))]),
        "receptor_angles": jnp.asarray(rng.uniform(
            -np.pi, np.pi, (b, L_REC, 8)).astype(np.float32)),
        "receptor_attn_mask": jnp.ones((b, L_REC), jnp.float32),
    }


def make_uncached_sampler(model, diffusion):
    """The pre-cache sampler: encoder hoisted, but k/v projected in-step."""

    @jax.jit
    def inner(params, batch, key):
        key_init, key_loop = jax.random.split(key)
        x_init = sample_wrapped_noise(
            key_init, batch["ligand_angles"].shape,
            batch["ligand_angles"].dtype)
        enc_out = model.apply(
            {"params": params}, batch["receptor_seq"],
            batch["receptor_angles"], batch["receptor_attn_mask"],
            deterministic=True, method=model.encode_receptor)

        def denoise_fn(t_vec, x):
            return model.apply(
                {"params": params}, t_vec, x, batch["ligand_attn_mask"],
                enc_out, batch["receptor_attn_mask"], deterministic=True,
                method=model.decode)

        return diffusion.sample_loop(denoise_fn, key_loop, x_init,
                                     return_trajectory=False)

    return inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    enc_cfg, dec_cfg = structure_model_configs(
        max_seq_len=L_REC, dtype=jnp.bfloat16)
    model = StructureDenoiser(enc_cfg, dec_cfg)
    diffusion = GaussianAngleDiffusion.cosine(T)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        batch = make_batch(b)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
            batch["ligand_angles"], batch["ligand_attn_mask"],
            batch["receptor_seq"], batch["receptor_angles"],
            batch["receptor_attn_mask"])["params"]

        variants = {
            "kv_cached": make_structure_sampler(
                model, diffusion, return_trajectory=False),
            "uncached": make_uncached_sampler(model, diffusion),
        }
        for name, run in variants.items():
            def synced(key):
                out = run(params, batch, key)
                final = out[0] if isinstance(out, tuple) else out
                return float(jnp.sum(final))

            synced(jax.random.PRNGKey(1))  # compile
            synced(jax.random.PRNGKey(1))  # post-compile transient
            times = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                synced(jax.random.PRNGKey(2 + i))
                times.append(time.perf_counter() - t0)
            rec = {"exp": "r3_kv_cache", "variant": name, "batch": b,
                   "t_steps": T, "lig": L_LIG, "rec": L_REC,
                   "min_s": round(min(times), 4),
                   "median_s": round(sorted(times)[len(times) // 2], 4),
                   "times": [round(t, 4) for t in times]}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(OUT, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
