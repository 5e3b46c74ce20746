"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: peptides sampled per second per chip with the FULL-SIZE
structure model (~146M params) at T=1000 DDPM steps, batch 64, max_len 64
(the reference's canonical sampling config, structure_model/sample.py:
16-41). The whole 1000-step reverse loop is one jitted lax.scan with
bfloat16 matmuls (TPU analog of the reference's TF32 'medium' precision).

vs_baseline compares against the BASELINE.json target of sampling a
<=16-residue peptide in < 2 s on one v5e chip: the target rate is
64 peptides / 2 s = 32 peptides/s; vs_baseline = rate / 32 (>1 beats it).

Run on the real TPU (default platform) or JAX_PLATFORMS=cpu for a smoke
run with E3DIFF_BENCH_SMOKE=1 (tiny model).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()  # skip the 30-340 s remote
    # compile on repeat runs; the timed region excludes compilation either
    # way (one untimed warmup call precedes the measurements)

    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser, structure_model_configs, TransformerConfig
    from e3diff_tpu.sampling.structure import make_structure_sampler

    smoke = os.environ.get("E3DIFF_BENCH_SMOKE", "") == "1"
    # receptor padded to 64 (reference test config); ligand bucketed to 16
    # (the BASELINE target is a <=16-residue peptide; bucketed padding is
    # the TPU-shape answer to variable lengths). B=32: a full batch must
    # fit inside the 2 s target window (B=1 takes 0.41 s; B=64 2.86 s —
    # see BENCHMARKS.md).
    b, l, l_lig, t_steps = (8, 16, 8, 20) if smoke else (32, 64, 16, 1000)

    if smoke:
        enc_cfg = TransformerConfig(
            hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
            max_position_embeddings=l, dtype=jnp.bfloat16)
        dec_cfg = TransformerConfig(
            hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
            max_position_embeddings=l, add_cross_attention=True,
            dtype=jnp.bfloat16)
    else:
        enc_cfg, dec_cfg = structure_model_configs(
            max_seq_len=l, dtype=jnp.bfloat16)
    model = StructureDenoiser(enc_cfg, dec_cfg)
    diffusion = GaussianAngleDiffusion.cosine(t_steps)

    rng = np.random.default_rng(0)
    batch = {
        "ligand_angles": np.zeros((b, l_lig, 8), np.float32),
        "ligand_attn_mask": np.ones((b, l_lig), np.float32),
        "receptor_seq": np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, l))],
        "receptor_angles": rng.uniform(
            -np.pi, np.pi, (b, l, 8)).astype(np.float32),
        "receptor_attn_mask": np.ones((b, l), np.float32),
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    # jit the init: eager flax init is dispatch-bound through the remote
    # tunnel (~107 s for 146M params; jitted ~55 s, and cacheable)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        jbatch["ligand_angles"], jbatch["ligand_attn_mask"],
        jbatch["receptor_seq"], jbatch["receptor_angles"],
        jbatch["receptor_attn_mask"])["params"]

    # int8_matmul parameter storage (round 5): >=2-D kernels packed as
    # int8 + per-channel scales, dequantized inside the scan body — the
    # HBM-resident per-step decoder weight stream is a quarter of f32.
    # Measured 1.224 -> 1.204 s on this headline vs the r4 bf16_matmul
    # default, and quality-gated on the trained flagship (class_acc equal
    # at the w=1.5 operating point, TV within 0.006 — BENCHMARKS.md
    # "Int8 weight-only storage"). E3DIFF_BENCH_PARAMS_DTYPE=bf16_matmul
    # reproduces the r4 configuration, =f32 the r3 one.
    bench_pdt = os.environ.get("E3DIFF_BENCH_PARAMS_DTYPE", "int8_matmul")
    if bench_pdt not in ("f32", "bf16", "bf16_matmul", "int8_matmul"):
        raise SystemExit(
            f"E3DIFF_BENCH_PARAMS_DTYPE={bench_pdt!r}: expected one of "
            "f32 | bf16 | bf16_matmul | int8_matmul")
    if bench_pdt != "f32":
        from e3diff_tpu.utils.params_io import cast_inference_params

        params = cast_inference_params(params, bench_pdt)

    sampler = make_structure_sampler(model, diffusion, step=1,
                                     return_trajectory=False)

    def run_synced(key):
        """Force a true host sync — block_until_ready can return early
        through the remote-TPU tunnel; a scalar host transfer cannot."""
        final, _ = sampler(params, jbatch, key)
        return float(jnp.sum(final))

    run_synced(jax.random.PRNGKey(1))  # compile

    # The v5e behind the tunnel is shared with other clients IN THIS
    # CONTAINER: a second live client (stale serve.py, a concurrent
    # experiment) serializes program execution and inflates step times
    # ~12x (BENCHMARKS.md). The headline is the FRAMEWORK's speed — so
    # take min-of-4 per round, and if the round ran while the chip
    # measured slow (in-program matmul chain ≈ 175 TFLOP/s nominal),
    # wait and retry a few times. Bounded: worst case adds ~15 min.
    def matmul_tflops(n_mm=256):
        a = jnp.full((4096, 4096), 1.0 / 64.0, jnp.bfloat16)

        @jax.jit
        def chain(m):   # in-program: per-call RTT would cap a call-per-
            return jax.lax.fori_loop(   # matmul probe at ~30 "TFLOP/s"
                0, n_mm, lambda _, x: (x @ x) * jnp.bfloat16(1.0 / 64.0), m)

        out = chain(a)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + sync
        t0 = time.perf_counter()
        out = chain(a)
        float(jnp.sum(out.astype(jnp.float32)))
        return n_mm * 2 * 4096 ** 3 / (time.perf_counter() - t0) / 1e12

    elapsed = None
    for attempt in range(4):
        times = []
        for i in range(4 if not smoke else 1):
            start = time.perf_counter()
            run_synced(jax.random.PRNGKey(2 + i))
            times.append(time.perf_counter() - start)
        elapsed = min(times) if elapsed is None else min(elapsed, min(times))
        if smoke or matmul_tflops() > 140:   # healthy round — record it
            break
        time.sleep(240)

    rate = b / elapsed
    # BASELINE target: 1000-step sampling of a <=16-residue peptide in
    # < 2 s on one v5e chip. We sample a whole batch of 32 peptides in the
    # target window; vs_baseline = target_seconds / measured_seconds
    # (>1 beats the target).
    print(json.dumps({
        "metric": "structure_ddpm_sample_batch32_seconds_T1000_lig16_146M",
        "value": round(elapsed, 3),
        "unit": f"s/batch32 ({rate:.1f} peptides/s/chip)",
        "vs_baseline": round(2.0 / elapsed, 3),
        # self-describing param storage (ADVICE r4): r3 numbers were f32
        "params_dtype": bench_pdt,
    }))


if __name__ == "__main__":
    main()
