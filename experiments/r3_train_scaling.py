"""Round-3 training-scaling experiments: gradient accumulation
(--accum_steps) and bf16 AdamW mu (--mu_dtype) on the 146M structure
model — the two levers the r2/r3 floor analyses left on the table
(BENCHMARKS.md: B=256 single-shot OOMs; the step is HBM-bound with the
optimizer state among the dominant byte streams).

Appends one JSON line per result to experiments/r3_results.jsonl.
Run with --isolate so an OOM cannot poison later experiments:

    python experiments/r3_train_scaling.py --exps all --isolate
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_results.jsonl")


def log_result(name, **kw):
    rec = {"exp": name, **kw}
    if os.environ.get("E3DIFF_EXP_TINY") != "1":  # smokes: stdout only
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _full_cfgs(max_len, **kw):
    import jax.numpy as jnp

    from e3diff_tpu.models import TransformerConfig

    base = dict(hidden_size=768, num_heads=12, num_layers=12,
                intermediate_size=1024, max_position_embeddings=max_len,
                dropout=0.1, attention_dropout=0.1,
                position_embedding_type="relative_key",
                init_style="torch_default", dtype=jnp.bfloat16)
    if os.environ.get("E3DIFF_EXP_TINY") == "1":  # CPU plumbing smoke
        base.update(hidden_size=64, num_heads=4, num_layers=2,
                    intermediate_size=128)
    base.update(kw)
    enc = TransformerConfig(**base, add_cross_attention=False)
    dec = TransformerConfig(**base, add_cross_attention=True)
    return enc, dec


def _train_batch(b, l):
    rng = np.random.default_rng(0)
    return {
        "ligand_angles": rng.uniform(-np.pi, np.pi, (b, l, 8)).astype(
            np.float32),
        "ligand_attn_mask": np.ones((b, l), np.float32),
        "receptor_seq": np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, l))],
        "receptor_angles": rng.uniform(-np.pi, np.pi, (b, l, 8)).astype(
            np.float32),
        "receptor_attn_mask": np.ones((b, l), np.float32),
    }


def run_train_exp(name, *, b=64, l=64, steps=30, accum=1, mu_dtype="f32",
                  mask_from="abstract", **cfg_kw):
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.training import StructureTrainer, make_optimizer

    enc, dec = _full_cfgs(l, **cfg_kw)
    model = StructureDenoiser(enc, dec)
    diffusion = GaussianAngleDiffusion.cosine(1000)
    batch = _train_batch(b, l)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    example = (None if mask_from == "none"
               else StructureTrainer(model, diffusion, None).abstract_params(
                   rng, batch))
    trainer = StructureTrainer(
        model, diffusion,
        make_optimizer(example, max_epochs=10, steps_per_epoch=100,
                       mu_dtype=mu_dtype),
        accum_steps=accum)
    state = trainer.create_state(rng, batch)
    init_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, dict(jbatch), rng)
    float(metrics["train_loss"])  # hard sync
    compile_s = time.perf_counter() - t0

    # post-compile transient: the first executions through the tunnel pay
    # a one-time program-load/allocation cost (measured: 2.7 s on the
    # first sync + 0.9 s on the next dispatch — at steps=10 that inflated
    # per-step 10x and was twice misdiagnosed as contention/degradation).
    # Warm until two consecutive synced steps agree within 20%.
    prev = None
    for i in range(10):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(
            state, dict(jbatch), jax.random.fold_in(rng, 100 + i))
        float(metrics["train_loss"])
        cur = time.perf_counter() - t0
        if prev is not None and abs(cur - prev) / max(cur, prev) < 0.2:
            break
        prev = cur

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer.train_step(
            state, dict(jbatch), jax.random.fold_in(rng, i))
    loss = float(metrics["train_loss"])  # hard sync
    per_step_ms = (time.perf_counter() - t0) / steps * 1000
    log_result(name, b=b, l=l, accum=accum, mu_dtype=mu_dtype,
               compile_s=round(compile_s, 1),
               init_s=round(init_s, 1), per_step_ms=round(per_step_ms, 2),
               steps_per_s=round(1000 / per_step_ms, 2),
               examples_per_s=round(b * 1000 / per_step_ms, 1),
               loss=round(loss, 4))


def run_train_profile(name, *, b=64, l=64, steps=5, accum=1,
                      mu_dtype="f32", mask_from="abstract"):
    """Trace `steps` train steps and print the device-time bucket digest:
    separates a genuinely slow program (device busy) from host/tunnel
    dispatch stalls. mask_from: 'abstract' (this harness's default),
    'none' (ckpt_overlap's make_optimizer(None)), 'real' (r2's eager
    init params)."""
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.training import StructureTrainer, make_optimizer
    from e3diff_tpu.utils.xplane import bucketize, device_op_totals, roofline

    enc, dec = _full_cfgs(l)
    model = StructureDenoiser(enc, dec)
    diffusion = GaussianAngleDiffusion.cosine(1000)
    batch = _train_batch(b, l)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    if mask_from == "none":
        example = None
    elif mask_from == "real":
        example = model.init(
            rng, jnp.zeros((b,), jnp.int32), jbatch["ligand_angles"],
            jbatch["ligand_attn_mask"], jbatch["receptor_seq"],
            jbatch["receptor_angles"], jbatch["receptor_attn_mask"])["params"]
    else:
        example = StructureTrainer(model, diffusion, None).abstract_params(
            rng, batch)
    trainer = StructureTrainer(
        model, diffusion,
        make_optimizer(example, max_epochs=10, steps_per_epoch=100,
                       mu_dtype=mu_dtype),
        accum_steps=accum)
    state = trainer.create_state(rng, batch)
    state, m = trainer.train_step(state, dict(jbatch), rng)
    float(m["train_loss"])  # compile + sync

    t0 = time.perf_counter()
    logdir = f"/tmp/r3_scaling_profile_{name}"
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, m = trainer.train_step(state, dict(jbatch),
                                          jax.random.fold_in(rng, i))
        float(m["train_loss"])
    wall_ms = (time.perf_counter() - t0) / steps * 1000
    totals = device_op_totals(logdir)
    buckets = bucketize(totals, steps=steps)
    roof = roofline(totals, steps=steps)
    log_result(name, b=b, l=l, accum=accum, mu_dtype=mu_dtype,
               mask_from=mask_from, wall_ms_per_step=round(wall_ms, 1),
               device_buckets_ms=buckets, roofline=roof)


def run_ckpt_overlap_exp(name, *, b=64, l=64, steps=30):
    """Snapshot checkpointing on the real chip: save() must return in
    ~copy time and training steps must proceed at full rate while the
    multi-GB device->host pull runs in the background thread (the r2
    measurement: orbax's blocking D2H section stalls 81 s per 512 MB
    through this tunnel)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.training import StructureTrainer, make_optimizer
    from e3diff_tpu.training.checkpoint import CheckpointManager

    enc, dec = _full_cfgs(l)
    model = StructureDenoiser(enc, dec)
    trainer = StructureTrainer(
        model, GaussianAngleDiffusion.cosine(1000),
        make_optimizer(None, max_epochs=10, steps_per_epoch=100))
    batch = _train_batch(b, l)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    state = trainer.create_state(rng, batch)
    state, m = trainer.train_step(state, dict(jbatch), rng)
    float(m["train_loss"])  # compile + sync
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(state)
                      if hasattr(x, "dtype"))

    # baseline steps with no save in flight
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer.train_step(state, dict(jbatch),
                                      jax.random.fold_in(rng, i))
    float(m["train_loss"])
    idle_ms = (time.perf_counter() - t0) / steps * 1000

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        t0 = time.perf_counter()
        mgr.save("last", {"state": state, "epoch": 0})
        save_return_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = trainer.train_step(state, dict(jbatch),
                                          jax.random.fold_in(rng, 100 + i))
        float(m["train_loss"])
        during_ms = (time.perf_counter() - t0) / steps * 1000
        t0 = time.perf_counter()
        mgr.wait_until_finished()
        drain_s = time.perf_counter() - t0
        ok = mgr.exists("last")
        mgr.close()

        # blocking baseline: the non-snapshot path on the same state
        mgr2 = CheckpointManager(d, snapshot_saves=False)
        t0 = time.perf_counter()
        mgr2.save("last2", {"state": state, "epoch": 0}, block=True)
        blocking_save_s = time.perf_counter() - t0
        mgr2.close()

    log_result(name, b=b, l=l, state_mb=round(state_bytes / 2**20, 1),
               save_return_s=round(save_return_s, 3),
               step_ms_idle=round(idle_ms, 1),
               step_ms_during_pull=round(during_ms, 1),
               overlap_steps=steps,
               remaining_drain_s=round(drain_s, 1),
               blocking_save_s=round(blocking_save_s, 1),
               committed=ok)


def run_prefetch_exp(name, *, b=64, l=64, n=512, epochs=3):
    """Real-input-pipeline throughput: per-step wall time when batches are
    assembled + H2D-transferred inline (prefetch=0) vs staged ahead on the
    background thread (prefetch=2). The synthetic benchmark steps reuse a
    pre-staged device batch, so this is the number an actual training run
    sees (BENCHMARKS.md: real epochs ran ~4x slower than the benchmark
    step through this tunnel)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from e3diff_tpu.data import (LigandBindingSiteData, prefetch_to_device,
                                 synthetic_complexes)
    from e3diff_tpu.data.dataset import strip_meta
    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.training import StructureTrainer, make_optimizer

    enc, dec = _full_cfgs(l)
    model = StructureDenoiser(enc, dec)
    trainer = StructureTrainer(
        model, GaussianAngleDiffusion.cosine(1000),
        make_optimizer(None, max_epochs=10, steps_per_epoch=100))
    if os.environ.get("E3DIFF_EXP_TINY") == "1":
        n, b = 32, 8
    ds = LigandBindingSiteData(
        synthetic_complexes(n=n, seed=1), None, max_len=l, pocket_ext=1)
    first = next(ds.batches(b))
    state = trainer.create_state(jax.random.PRNGKey(0), strip_meta(first))
    rng = jax.random.PRNGKey(1)
    state, m = trainer.train_step(state, strip_meta(first), rng)
    float(m["train_loss"])  # compile + sync

    out = {}
    for mode in (0, 2):
        t0 = time.perf_counter()
        steps = 0
        for epoch in range(epochs):
            batches = ds.batches(b, shuffle=True, seed=epoch,
                                 drop_last=True)
            if mode:
                batches = prefetch_to_device(batches, size=mode)
            for batch in batches:
                rng, step_rng = jax.random.split(rng)
                state, m = trainer.train_step(
                    state, strip_meta(batch), step_rng)
                steps += 1
        float(m["train_loss"])  # hard sync
        out[f"step_ms_prefetch{mode}"] = round(
            (time.perf_counter() - t0) / steps * 1000, 2)
    log_result(name, b=b, l=l, n=n, steps_per_epoch=n // b, **out)


EXPS = {
    # r2 baselines for side-by-side context: b64 95.9 ms, b128 158.1 ms,
    # b256 single-shot OOM (experiments/r2_results.jsonl)
    # control: this harness at the exact r2 train_base config — separates
    # harness effects from the mu_dtype/accum knobs
    "train_b64_control": lambda: run_train_exp("train_b64_control", b=64),
    "train_b64_ctl_none": lambda: run_train_exp("train_b64_ctl_none", b=64,
                                                mask_from="none"),
    "train_b64_ctl_steps30": lambda: run_train_exp("train_b64_ctl_steps30",
                                                   b=64, steps=30),
    "train_b64_mu16": lambda: run_train_exp("train_b64_mu16", b=64,
                                            mu_dtype="bf16"),
    "train_b128_mu16": lambda: run_train_exp("train_b128_mu16", b=128,
                                             mu_dtype="bf16"),
    "train_b128_control": lambda: run_train_exp("train_b128_control", b=128),
    "train_b256_accum2": lambda: run_train_exp("train_b256_accum2", b=256,
                                               accum=2),
    "train_b256_accum4": lambda: run_train_exp("train_b256_accum4", b=256,
                                               accum=4),
    "train_b256_accum4_mu16": lambda: run_train_exp(
        "train_b256_accum4_mu16", b=256, accum=4, mu_dtype="bf16"),
    "train_b256_accum2_mu16": lambda: run_train_exp(
        "train_b256_accum2_mu16", b=256, accum=2, mu_dtype="bf16"),
    "train_b512_accum8": lambda: run_train_exp("train_b512_accum8", b=512,
                                               accum=8),
    "train_b512_accum4": lambda: run_train_exp("train_b512_accum4", b=512,
                                               accum=4),
    "train_b64_accum2": lambda: run_train_exp("train_b64_accum2", b=64,
                                              accum=2),
    "ckpt_overlap": lambda: run_ckpt_overlap_exp("ckpt_overlap"),
    "input_prefetch": lambda: run_prefetch_exp("input_prefetch"),
    "prof_abstract": lambda: run_train_profile("prof_abstract"),
    "prof_masknone": lambda: run_train_profile("prof_masknone",
                                               mask_from="none"),
    "prof_maskreal": lambda: run_train_profile("prof_maskreal",
                                               mask_from="real"),
    "prof_mu16": lambda: run_train_profile("prof_mu16", mu_dtype="bf16",
                                           mask_from="real"),
    "prof_accum2": lambda: run_train_profile("prof_accum2", accum=2,
                                             mask_from="real"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", required=True,
                        help="comma-separated experiment names, or 'all'")
    parser.add_argument("--isolate", action="store_true",
                        help="one subprocess per experiment so an OOM "
                             "cannot poison the rest")
    args = parser.parse_args()
    names = list(EXPS) if args.exps == "all" else args.exps.split(",")
    if args.isolate:
        import subprocess

        for n in names:
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--exps", n], check=False)
        return
    if os.environ.get("E3DIFF_EXP_PLATFORM"):  # e.g. cpu for plumbing smoke
        import jax

        jax.config.update("jax_platforms", os.environ["E3DIFF_EXP_PLATFORM"])
    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()   # repeat runs skip 110-530 s
    for n in names:
        try:
            EXPS[n]()
        except Exception as e:  # keep going; record the failure
            log_result(n, error=f"{type(e).__name__}: {e}"[:500])


if __name__ == "__main__":
    main()
