"""Round-3 performance experiments: the sequence model (61M) gets the
structure model's r2 treatment (VERDICT r2 weak #1 / next #4).

Runs named experiments on the real TPU chip and appends one JSON line per
result to experiments/r3_results.jsonl:

    python experiments/r3_seq_perf.py --exps train_b64,train_b128,...

* train_bN      — fused train step at batch N: per-step ms, examples/s,
                  and estimated MFU from the compiled HLO flop count
                  (cost_analysis) against the v5e bf16 peak.
* train_profile — 5 profiled steps -> per-op device time bucketized by
                  utils/xplane.py (the dependency-free XSpace reader).
* sample_b64    — 50-step D3PM sampler at the headline bucket config
                  (lig16/rec64): ms/batch, peptides/s, + profile buckets.
* sample_skipN  — the skip-step ladder at N model forwards.
* train_f32     — precision ablation.

Timing uses hard host syncs (float(jnp.sum(...))) — block_until_ready
can return early through the remote-TPU tunnel (utils/timing.py).
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

V5E_BF16_PEAK = 197e12   # FLOP/s, one v5e chip
V5E_F32_PEAK = 98.5e12


def log_result(name, **kw):
    rec = {"exp": name, **kw}
    if os.environ.get("E3DIFF_EXP_TINY") != "1":  # smokes: stdout only
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _full_cfgs(max_len, **kw):
    import jax.numpy as jnp
    from e3diff_tpu.models import TransformerConfig

    base = dict(hidden_size=768, num_heads=12, num_layers=6,
                intermediate_size=1024, max_position_embeddings=max_len,
                dropout=0.1, attention_dropout=0.1,
                position_embedding_type="relative_key",
                init_style="xavier_all", dtype=jnp.bfloat16)
    if os.environ.get("E3DIFF_EXP_TINY") == "1":  # CPU plumbing smoke
        base.update(hidden_size=64, num_heads=4, num_layers=2,
                    intermediate_size=128)
    base.update(kw)
    enc = TransformerConfig(**base, add_cross_attention=False)
    dec = TransformerConfig(**base, add_cross_attention=True)
    return enc, dec


def _train_batch(b, l, l_lig=None):
    """l = receptor length; l_lig defaults to l (the reference pads the
    ligand to max_len too) — pass 16 for the production bucketed shape."""
    l_lig = l if l_lig is None else l_lig
    rng = np.random.default_rng(0)
    eye = np.eye(20, dtype=np.float32)
    return {
        "ligand_seq": eye[rng.integers(0, 20, (b, l_lig))],
        "ligand_angles": rng.uniform(-np.pi, np.pi, (b, l_lig, 8)).astype(
            np.float32),
        "ligand_attn_mask": np.ones((b, l_lig), np.float32),
        "receptor_seq": eye[rng.integers(0, 20, (b, l))],
        "receptor_angles": rng.uniform(-np.pi, np.pi, (b, l, 8)).astype(
            np.float32),
        "receptor_attn_mask": np.ones((b, l), np.float32),
    }


def _sample_batch(b, l_lig, l_rec):
    return _train_batch(b, l_rec, l_lig)


def _build(b, l, l_lig=None, **cfg_kw):
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import D3PMDiffusion
    from e3diff_tpu.models import SequenceDenoiser
    from e3diff_tpu.ops import BlosumTransition
    from e3diff_tpu.training import SequenceTrainer, make_optimizer

    enc, dec = _full_cfgs(l, **cfg_kw)
    model = SequenceDenoiser(enc, dec)
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    batch = _train_batch(b, l, l_lig)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((b, 1)), jbatch["ligand_seq"],
        jbatch["ligand_angles"], jbatch["ligand_attn_mask"],
        jbatch["receptor_seq"], jbatch["receptor_angles"],
        jbatch["receptor_attn_mask"])["params"]
    trainer = SequenceTrainer(
        model, d3pm, make_optimizer(params, max_epochs=10,
                                    steps_per_epoch=100))
    state = trainer.create_state(rng, batch)
    return model, d3pm, trainer, state, batch, jbatch


def _step_flops(trainer, state, jbatch):
    """HLO flop estimate of ONE fused train step (fwd+bwd+AdamW) from the
    compiled executable's cost analysis; None when unavailable."""
    import jax

    try:
        compiled = (jax.jit(trainer.train_step)
                    .lower(state, jbatch, jax.random.PRNGKey(0))
                    .compile())
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")
        return None


def run_train_exp(name, *, b=64, l=64, l_lig=None, steps=10,
                  peak=V5E_BF16_PEAK, **cfg_kw):
    import jax
    import jax.numpy as jnp  # noqa: F401

    t0 = time.perf_counter()
    model, d3pm, trainer, state, batch, jbatch = _build(
        b, l, l_lig, **cfg_kw)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    init_s = time.perf_counter() - t0

    rng = jax.random.PRNGKey(1)
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

    flops = _step_flops(trainer, state, jbatch)
    mfu = (round(flops / (per_step_ms / 1000) / peak, 4)
           if flops else None)
    log_result(name, b=b, l=l, l_lig=l_lig or l, n_params=n_params,
               compile_s=round(compile_s, 1), init_s=round(init_s, 1),
               per_step_ms=round(per_step_ms, 2),
               steps_per_s=round(1000 / per_step_ms, 2),
               examples_per_s=round(b * 1000 / per_step_ms, 1),
               step_gflops=round(flops / 1e9, 1) if flops else None,
               est_mfu=mfu, loss=round(loss, 4))


def run_train_profile(name, *, b=64, l=64, steps=5, **cfg_kw):
    import jax

    from e3diff_tpu.utils.xplane import (
        bucketize, device_op_totals, roofline, top_ops)

    model, d3pm, trainer, state, batch, jbatch = _build(b, l, **cfg_kw)
    rng = jax.random.PRNGKey(1)
    state, metrics = trainer.train_step(state, dict(jbatch), rng)
    float(metrics["train_loss"])  # compile + sync

    logdir = "/tmp/r3_seq_profile_train"
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, metrics = trainer.train_step(
                state, dict(jbatch), jax.random.fold_in(rng, i))
        float(metrics["train_loss"])
    totals = device_op_totals(logdir)
    log_result(name, b=b, l=l,
               buckets_ms_per_step=bucketize(totals, steps=steps),
               roofline=roofline(totals, steps=steps),
               top_ops=top_ops(totals, n=12, steps=steps))


def run_sample_exp(name, *, b=64, l_lig=16, l_rec=64, n_steps=None,
                   repeats=4, profile=False, **cfg_kw):
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import D3PMDiffusion
    from e3diff_tpu.models import SequenceDenoiser
    from e3diff_tpu.ops import BlosumTransition
    from e3diff_tpu.sampling.sequence import make_sequence_sampler

    enc, dec = _full_cfgs(max(l_lig, l_rec), **cfg_kw)
    model = SequenceDenoiser(enc, dec)
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    batch = _sample_batch(b, l_lig, l_rec)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b, 1)), jbatch["ligand_seq"],
        jbatch["ligand_angles"], jbatch["ligand_attn_mask"],
        jbatch["receptor_seq"], jbatch["receptor_angles"],
        jbatch["receptor_attn_mask"])["params"]
    sampler = make_sequence_sampler(model, d3pm, diverse=True,
                                    n_steps=n_steps)

    def run_synced(key):
        return float(jnp.sum(sampler(params, jbatch, key)))

    t0 = time.perf_counter()
    run_synced(jax.random.PRNGKey(1))
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run_synced(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    fwd = n_steps if n_steps else 49
    rec = dict(b=b, l_lig=l_lig, l_rec=l_rec, model_forwards=fwd,
               compile_s=round(compile_s, 1), batch_ms=round(elapsed * 1e3, 1),
               ms_per_forward=round(elapsed / fwd * 1000, 3),
               peptides_per_s=round(b / elapsed, 1))
    if profile:
        from e3diff_tpu.utils.xplane import (
            bucketize, device_op_totals, roofline)

        logdir = "/tmp/r3_seq_profile_sample"
        with jax.profiler.trace(logdir):
            run_synced(jax.random.PRNGKey(9))
        totals = device_op_totals(logdir)
        rec["buckets_ms_per_forward"] = bucketize(totals, steps=fwd)
        rec["roofline"] = roofline(totals, steps=fwd)
    log_result(name, **rec)


EXPS = {
    "train_b32": lambda: run_train_exp("train_b32", b=32),
    "train_b64": lambda: run_train_exp("train_b64", b=64),
    "train_b128": lambda: run_train_exp("train_b128", b=128),
    "train_b256": lambda: run_train_exp("train_b256", b=256),
    "train_b512": lambda: run_train_exp("train_b512", b=512),
    "train_f32": lambda: run_train_exp("train_f32", b=64, peak=V5E_F32_PEAK,
                                       dtype=None),
    "train_l128": lambda: run_train_exp("train_l128", b=64, l=128),
    "train_profile": lambda: run_train_profile("train_profile", b=64),
    "train_lig16": lambda: run_train_exp("train_lig16", b=64, l_lig=16),
    "train_lig16_b256": lambda: run_train_exp("train_lig16_b256", b=256,
                                              l_lig=16),
    "sample_b64": lambda: run_sample_exp("sample_b64", profile=True),
    "sample_b128": lambda: run_sample_exp("sample_b128", b=128),
    "sample_b256": lambda: run_sample_exp("sample_b256", b=256),
    "sample_skip25": lambda: run_sample_exp("sample_skip25", n_steps=25),
    "sample_skip10": lambda: run_sample_exp("sample_skip10", n_steps=10),
}


def main():
    # reruns of the same experiment skip the 60-250 s remote compile
    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", required=True,
                        help=f"comma list from {sorted(EXPS)}")
    args = parser.parse_args()
    for name in args.exps.split(","):
        name = name.strip()
        if not name:
            continue
        try:
            EXPS[name]()
        except Exception as e:
            log_result(name, error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
