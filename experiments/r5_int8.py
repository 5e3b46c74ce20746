"""A/B: bf16_matmul (r4 best) vs int8_matmul weight-only storage (r5).

The roofline (BENCHMARKS.md floor analysis) leaves exactly one untried
storage lever: sub-bf16 weight bytes. int8 + per-channel scales halves
the sampler-step weight stream again (utils/quant.py dequantizes inside
the scan body, so the HBM-resident form stays int8). This measures the
headline DDPM-1000 config, the serving DDIM-25 config, and the sequence
D3PM-50 config on the real chip, against the shipping bf16 variants.

Usage: python experiments/r5_int8.py [--batches 32,64] [--exps ddpm,ddim,seq]
Appends JSON lines to experiments/r5_results.jsonl.
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

from e3diff_tpu.diffusion import D3PMDiffusion, GaussianAngleDiffusion
from e3diff_tpu.models import (
    SequenceDenoiser,
    StructureDenoiser,
    sequence_model_configs,
    structure_model_configs,
)
from e3diff_tpu.ops import UniformTransition
from e3diff_tpu.sampling.sequence import make_sequence_sampler
from e3diff_tpu.sampling.structure import make_structure_sampler
from e3diff_tpu.utils.params_io import cast_inference_params

L_REC, L_LIG, T = 64, 16, 1000
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_results.jsonl")


def make_batch(b):
    rng = np.random.default_rng(0)
    return {
        "ligand_angles": jnp.zeros((b, L_LIG, 8), jnp.float32),
        "ligand_attn_mask": jnp.ones((b, L_LIG), jnp.float32),
        "ligand_seq": jnp.asarray(np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, L_LIG))]),
        "receptor_seq": jnp.asarray(np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, L_REC))]),
        "receptor_angles": jnp.asarray(rng.uniform(
            -np.pi, np.pi, (b, L_REC, 8)).astype(np.float32)),
        "receptor_attn_mask": jnp.ones((b, L_REC), jnp.float32),
    }


def time_variant(run, params, batch, reps, exp, extra):
    def synced(key):
        out = run(params, batch, key)
        final = out[0] if isinstance(out, tuple) else out
        return float(jnp.sum(jnp.asarray(final, jnp.float32)))

    synced(jax.random.PRNGKey(1))  # compile
    synced(jax.random.PRNGKey(1))  # post-compile transient
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        synced(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    rec = {"exp": exp, **extra,
           "min_s": round(min(times), 4),
           "median_s": round(sorted(times)[len(times) // 2], 4),
           "times": [round(t, 4) for t in times]}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--exps", default="ddpm,ddim,seq")
    args = ap.parse_args()
    exps = set(args.exps.split(","))

    enc_cfg, dec_cfg = structure_model_configs(
        max_seq_len=L_REC, dtype=jnp.bfloat16)
    model = StructureDenoiser(enc_cfg, dec_cfg)
    diffusion = GaussianAngleDiffusion.cosine(T)

    results = []
    batches = [int(x) for x in args.batches.split(",")]
    for b in batches:
        batch = make_batch(b)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
            batch["ligand_angles"], batch["ligand_attn_mask"],
            batch["receptor_seq"], batch["receptor_angles"],
            batch["receptor_attn_mask"])["params"]
        pvariants = {
            "bf16_matmul": cast_inference_params(params, "bf16_matmul"),
            "int8_matmul": cast_inference_params(params, "int8_matmul"),
        }

        if "ddpm" in exps:
            run = make_structure_sampler(model, diffusion,
                                         return_trajectory=False)
            for name, p in pvariants.items():
                results.append(time_variant(
                    run, p, batch, args.reps, "r5_int8",
                    {"variant": name, "batch": b, "t_steps": T,
                     "sampler": "ddpm", "lig": L_LIG, "rec": L_REC}))

        if "ddim" in exps:
            run = make_structure_sampler(model, diffusion,
                                         return_trajectory=False,
                                         sampler="ddim", ddim_steps=25)
            for name, p in pvariants.items():
                results.append(time_variant(
                    run, p, batch, args.reps, "r5_int8",
                    {"variant": name, "batch": b, "t_steps": 25,
                     "sampler": "ddim25", "lig": L_LIG, "rec": L_REC}))

    if "seq" in exps:
        qenc, qdec = sequence_model_configs(max_seq_len=L_REC,
                                            dtype=jnp.bfloat16)
        qmodel = SequenceDenoiser(qenc, qdec)
        d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=50)
        b = batches[-1]
        batch = make_batch(b)
        qparams = jax.jit(qmodel.init)(
            jax.random.PRNGKey(0), jnp.zeros((b, 1)),
            batch["ligand_seq"], batch["ligand_angles"],
            batch["ligand_attn_mask"], batch["receptor_seq"],
            batch["receptor_angles"], batch["receptor_attn_mask"])["params"]
        run = make_sequence_sampler(qmodel, d3pm, diverse=True)
        for name, p in {
                "bf16": cast_inference_params(qparams, "bf16"),
                "int8_matmul": cast_inference_params(qparams,
                                                     "int8_matmul")}.items():
            results.append(time_variant(
                run, p, batch, args.reps, "r5_int8",
                {"variant": name, "batch": b, "t_steps": 50,
                 "sampler": "d3pm", "lig": L_LIG, "rec": L_REC}))

    with open(OUT, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
