"""Round-2 performance experiments on the real TPU chip.

Runs a named list of experiments (training-step and sampler variants on the
full-size 146M structure model) and appends one JSON line per result to
experiments/r2_results.jsonl. Designed for a single background invocation:

    python experiments/r2_perf.py --exps train_base,train_dots,...

Timing uses hard host syncs (float(jnp.sum(...))) — block_until_ready can
return early through the remote-TPU tunnel (see utils/timing.py).
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
                       "r2_results.jsonl")


def log_result(name, **kw):
    rec = {"exp": name, **kw}
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


def run_train_exp(name, *, b=64, l=64, steps=10, **cfg_kw):
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
    params = model.init(
        rng, jnp.zeros((b,), jnp.int32), jbatch["ligand_angles"],
        jbatch["ligand_attn_mask"], jbatch["receptor_seq"],
        jbatch["receptor_angles"], jbatch["receptor_attn_mask"])["params"]
    trainer = StructureTrainer(
        model, diffusion,
        make_optimizer(params, max_epochs=10, steps_per_epoch=100))
    state = trainer.create_state(rng, batch)
    init_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, dict(jbatch), rng)
    float(metrics["train_loss"])  # hard sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer.train_step(
            state, dict(jbatch), jax.random.fold_in(rng, i))
    loss = float(metrics["train_loss"])  # hard sync
    per_step_ms = (time.perf_counter() - t0) / steps * 1000
    log_result(name, b=b, l=l, compile_s=round(compile_s, 1),
               init_s=round(init_s, 1), per_step_ms=round(per_step_ms, 2),
               steps_per_s=round(1000 / per_step_ms, 2),
               examples_per_s=round(b * 1000 / per_step_ms, 1),
               loss=round(loss, 4))


def run_sample_exp(name, *, b=64, l_lig=16, l_rec=64, t_steps=1000,
                   trajectory=False, traj_dtype=None, transfer=False,
                   repeats=3, **cfg_kw):
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.sampling.structure import make_structure_sampler

    enc, dec = _full_cfgs(max(l_lig, l_rec), **cfg_kw)
    model = StructureDenoiser(enc, dec)
    diffusion = GaussianAngleDiffusion.cosine(t_steps)

    rng = np.random.default_rng(0)
    batch = {
        "ligand_angles": np.zeros((b, l_lig, 8), np.float32),
        "ligand_attn_mask": np.ones((b, l_lig), np.float32),
        "receptor_seq": np.eye(20, dtype=np.float32)[
            rng.integers(0, 20, (b, l_rec))],
        "receptor_angles": rng.uniform(-np.pi, np.pi, (b, l_rec, 8)).astype(
            np.float32),
        "receptor_attn_mask": np.ones((b, l_rec), np.float32),
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        jbatch["ligand_angles"], jbatch["ligand_attn_mask"],
        jbatch["receptor_seq"], jbatch["receptor_angles"],
        jbatch["receptor_attn_mask"])["params"]

    td = None
    if traj_dtype == "bf16":
        td = jnp.bfloat16
    sampler = make_structure_sampler(model, diffusion, step=1,
                                     return_trajectory=trajectory,
                                     trajectory_dtype=td)

    def run_synced(key):
        final, traj = sampler(params, jbatch, key)
        return float(jnp.sum(final)), traj

    t0 = time.perf_counter()
    run_synced(jax.random.PRNGKey(1))
    compile_s = time.perf_counter() - t0

    times, ttimes = [], []
    for i in range(repeats):
        t0 = time.perf_counter()
        _, traj = run_synced(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
        if trajectory and transfer:
            t0 = time.perf_counter()
            np.asarray(traj)
            ttimes.append(time.perf_counter() - t0)
    elapsed = min(times)
    rec = dict(b=b, l_lig=l_lig, l_rec=l_rec, t_steps=t_steps,
               compile_s=round(compile_s, 1),
               batch_s=round(elapsed, 3),
               ms_per_step=round(elapsed / t_steps * 1000, 3),
               peptides_per_s=round(b / elapsed, 1))
    if ttimes:
        rec["traj_transfer_s"] = round(min(ttimes), 3)
    log_result(name, **rec)


def run_sustained_exp(name, *, n_batches=3, b=64, l=64, t_steps=1000,
                      traj_dtype=None):
    """Multi-batch faithful sampling with the async transfer overlap in
    sample_structure_batches: wall-clock per batch including pulling every
    trajectory to host (what the reference's output.pkl actually costs)."""
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.sampling.structure import sample_structure_batches

    enc, dec = _full_cfgs(l)
    model = StructureDenoiser(enc, dec)
    diffusion = GaussianAngleDiffusion.cosine(t_steps)
    batch = _train_batch(b, l)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        *[jnp.asarray(batch[k]) for k in
          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
           "receptor_angles", "receptor_attn_mask"]])["params"]

    td = jnp.bfloat16 if traj_dtype == "bf16" else None
    # warm the (now cached) jit program with one full batch incl. transfer
    sample_structure_batches(
        params, model, diffusion, [dict(batch)], jax.random.PRNGKey(1),
        first_batch_only=False, return_trajectory=True, trajectory_dtype=td)

    t0 = time.perf_counter()
    out = sample_structure_batches(
        params, model, diffusion, [dict(batch) for _ in range(n_batches)],
        jax.random.PRNGKey(2), first_batch_only=False,
        return_trajectory=True, trajectory_dtype=td)
    elapsed = time.perf_counter() - t0
    assert len(out) == n_batches * b and out[0].dtype == np.float32
    log_result(name, n_batches=n_batches, b=b, l=l,
               total_s=round(elapsed, 2),
               s_per_batch=round(elapsed / n_batches, 2),
               peptides_per_s=round(n_batches * b / elapsed, 1))


def run_sustained_debug(name):
    """Phase breakdown of one faithful batch: dispatch / compute / traj
    transfer / host slicing — to explain the sustained-run wall clock."""
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser
    from e3diff_tpu.sampling.structure import make_structure_sampler

    b = l = 64
    enc, dec = _full_cfgs(l)
    model = StructureDenoiser(enc, dec)
    diffusion = GaussianAngleDiffusion.cosine(1000)
    batch = _train_batch(b, l)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        *[jbatch[k] for k in
          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
           "receptor_angles", "receptor_attn_mask"]])["params"]
    sampler = make_structure_sampler(model, diffusion,
                                     return_trajectory=True)
    f, t = sampler(params, jbatch, jax.random.PRNGKey(1))  # compile
    float(jnp.sum(f))
    np.asarray(t)

    phases = {}
    t0 = time.perf_counter()
    final, traj = sampler(params, jbatch, jax.random.PRNGKey(2))
    phases["dispatch_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(final))
    phases["compute_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    traj_np = np.asarray(traj)
    phases["traj_transfer_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    parts = [traj_np[:, i, :48, :] for i in range(b)]
    phases["slice_s"] = time.perf_counter() - t0
    assert len(parts) == b
    # second run: np.asarray WITHOUT the prior hard sync (the sustained
    # path) — does device_get while busy behave differently?
    t0 = time.perf_counter()
    final, traj = sampler(params, jbatch, jax.random.PRNGKey(3))
    traj_np = np.asarray(traj)
    phases["dispatch_plus_unsync_get_s"] = time.perf_counter() - t0
    log_result(name, **{k: round(v, 3) for k, v in phases.items()})


EXPS = {
    # training-step variants (146M, B=64, L=64, bf16, dropout on)
    "train_base": lambda: run_train_exp("train_base"),
    "train_dots": lambda: run_train_exp("train_dots", remat="dots"),
    "train_layer": lambda: run_train_exp("train_layer", remat="layer"),
    "train_scan": lambda: run_train_exp("train_scan", scan_layers=True),
    "train_b128": lambda: run_train_exp("train_b128", b=128),
    "train_b256": lambda: run_train_exp("train_b256", b=256),
    # bucket-16 sampler
    "samp16_base": lambda: run_sample_exp("samp16_base"),
    "samp16_bd": lambda: run_sample_exp(
        "samp16_bd", self_attention_impl="blockdiag"),
    "samp16_b32": lambda: run_sample_exp("samp16_b32", b=32),
    "samp16_b32_bd": lambda: run_sample_exp(
        "samp16_b32_bd", b=32, self_attention_impl="blockdiag"),
    # reference-faithful config: L=64 both sides
    "faithful_notraj": lambda: run_sample_exp("faithful_notraj", l_lig=64),
    "faithful_f32": lambda: run_sample_exp(
        "faithful_f32", l_lig=64, trajectory=True, transfer=True),
    "faithful_bf16": lambda: run_sample_exp(
        "faithful_bf16", l_lig=64, trajectory=True, traj_dtype="bf16",
        transfer=True),
    "faithful_bd": lambda: run_sample_exp(
        "faithful_bd", l_lig=64, self_attention_impl="blockdiag"),
    # sustained overlap: compute of batch n+1 hides transfer of batch n
    "sustained_f32": lambda: run_sustained_exp("sustained_f32"),
    "sustained_bf16": lambda: run_sustained_exp("sustained_bf16",
                                                traj_dtype="bf16"),
    "sustained_serial_f32": lambda: run_sustained_exp(
        "sustained_serial_f32", n_batches=1),
    "sustained_debug": lambda: run_sustained_debug("sustained_debug"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", required=True,
                        help="comma-separated experiment names, or 'all'")
    parser.add_argument("--isolate", action="store_true",
                        help="run each experiment in its own subprocess so "
                             "an OOM cannot poison the rest (a b=256 OOM "
                             "cascaded RESOURCE_EXHAUSTED through every "
                             "later experiment in round 2's first run)")
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
    for n in names:
        try:
            EXPS[n]()
        except Exception as e:  # keep going; record the failure
            log_result(n, error=f"{type(e).__name__}: {e}"[:500])


if __name__ == "__main__":
    main()
