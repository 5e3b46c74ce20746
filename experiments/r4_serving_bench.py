"""Round-4 serving benchmark: unloaded latency + burst tails.

Builds on r3_serving_bench (full-size 146M + 61M engines on the real
chip) and measures the round-4 serving levers:

* serve_unloaded   — single-request latency across engine configs:
                     r3 baseline (25 ms window, full-batch shapes) vs
                     linger dispatch vs linger + batch-size buckets
                     (B=8 shape for lone requests) vs + bf16 params.
* serve_burst      — 64 closed-loop HTTP clients: req/s, p50/p95/p99,
                     occupancy, with the tuned config.
* serve_rbucket    — receptor-bucket routing cost/benefit: engine
                     open-loop rate with rec buckets [64] vs [32, 64]
                     on a short-pocket workload.

Appends JSON lines to experiments/r4_results.jsonl. Set
E3DIFF_EXP_TINY=1 for a CPU smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.r3_serving_bench import (  # noqa: E402
    TINY,
    build_engine,
    make_pockets,
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r4_results.jsonl")


def log_result(name, **kw):
    rec = {"exp": name, **kw}
    if not TINY:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _cast_engine_params(engine):
    from e3diff_tpu.utils.params_io import cast_inference_params

    engine.structure_params = cast_inference_params(
        engine.structure_params, "bf16")
    engine.sequence_params = cast_inference_params(
        engine.sequence_params, "bf16")
    return engine


def _post(port, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/design",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _payloads(n, seed=7):
    out = []
    for p in make_pockets(n, seed=seed):
        n_pocket = int(np.asarray(p["pocket_mask"]).sum())
        out.append({
            "pocket": {
                "sequence": "".join(p["amino_acid"][:n_pocket]),
                "angles": np.asarray(
                    p["angle_features"][:n_pocket]).tolist(),
                "peptide_length": int(np.asarray(p["ligand_mask"]).sum()),
            },
            "return_pdb": False,
        })
    return out


def bench_unloaded(tag, engine, max_wait_ms, linger_ms, reps=8):
    from e3diff_tpu.serving import DesignServer

    server = DesignServer(engine, port=0, max_wait_ms=max_wait_ms,
                          linger_ms=linger_ms)
    server.start()
    try:
        payloads = _payloads(4)
        _post(server.port, payloads[0])  # warm the HTTP path
        lats = []
        for i in range(reps):
            t0 = time.perf_counter()
            _post(server.port, payloads[i % len(payloads)])
            lats.append(time.perf_counter() - t0)
        log_result("serve_unloaded", config=tag,
                   max_wait_ms=max_wait_ms, linger_ms=linger_ms,
                   unloaded_ms_min=round(1e3 * min(lats), 1),
                   unloaded_ms_median=round(
                       1e3 * sorted(lats)[len(lats) // 2], 1),
                   times_ms=[round(1e3 * t, 1) for t in lats])
    finally:
        server.shutdown()


def bench_burst(tag, engine, clients=64, reqs_per_client=6,
                max_wait_ms=25.0, linger_ms=2.0):
    from e3diff_tpu.serving import DesignServer

    server = DesignServer(engine, port=0, max_wait_ms=max_wait_ms,
                          linger_ms=linger_ms)
    server.start()
    port = server.port
    payloads = _payloads(clients)
    errors = []

    def client(i):
        try:
            for _ in range(reqs_per_client):
                body = _post(port, payloads[i])
                assert body["designs"][0]["sequence"]
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))

    _post(port, payloads[0])  # warm
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = server.batcher.stats()
    server.shutdown()
    assert not errors, errors[:3]
    total = clients * reqs_per_client
    log_result("serve_burst", config=tag, clients=clients, requests=total,
               max_wait_ms=max_wait_ms, linger_ms=linger_ms,
               wall_s=round(wall, 3),
               requests_per_s=round(total / wall, 1),
               latency_ms_p50=round(stats.get("latency_ms_p50", 0), 1),
               latency_ms_p95=round(stats.get("latency_ms_p95", 0), 1),
               latency_ms_p99=round(stats.get("latency_ms_p99", 0), 1),
               mean_batch_occupancy=round(
                   stats["mean_batch_occupancy"], 1))


def bench_rbuckets():
    """Open-loop engine rate on a short-pocket workload (30-residue
    pockets) with one receptor shape (64) vs routed buckets [32, 64]."""
    import jax

    from e3diff_tpu.data.dataset import AA_VOCAB
    from e3diff_tpu.serving import pocket_record

    rng = np.random.default_rng(3)
    short_pockets = []
    bsz = 8 if TINY else 64
    for _ in range(bsz):
        n = 8 if TINY else int(rng.integers(24, 31))
        seq = "".join(AA_VOCAB[i] for i in rng.integers(0, 20, n))
        ang = rng.uniform(-np.pi, np.pi, (n, 8)).astype(np.float32)
        short_pockets.append(pocket_record(seq, ang, 5 if TINY else 12))

    for tag, rbuckets in [("single64", None),
                          ("routed3264", [16, 32] if TINY else [32, 64])]:
        engine = build_engine(batch_size=bsz, seq_skip_steps=2 if TINY
                              else 25, receptor_buckets=rbuckets)
        # warm the exact path
        engine.design_records(short_pockets[:1],
                              key=jax.random.PRNGKey(0), return_pdb=False)
        times = []
        for r in range(2 if TINY else 4):
            t0 = time.perf_counter()
            res = engine.design_records(short_pockets,
                                        key=jax.random.PRNGKey(r),
                                        return_pdb=False)
            times.append(time.perf_counter() - t0)
            assert len(res) == bsz
        best = min(times)
        log_result("serve_rbucket", config=tag, batch=bsz,
                   receptor_buckets=rbuckets or [64],
                   s_per_batch=round(best, 4),
                   designs_per_s=round(bsz / best, 1),
                   times=[round(t, 4) for t in times])


def main():
    import argparse

    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", default="unloaded,burst",
                        help="comma list of: unloaded, burst, rbucket")
    exps = set(parser.parse_args().exps.split(","))
    if not TINY:
        enable_persistent_compilation_cache()

    bsz = 8 if TINY else 64
    small = 2 if TINY else 8
    if "unloaded" in exps:
        # r3 baseline: full window, one batch shape
        eng = build_engine(batch_size=bsz, seq_skip_steps=2 if TINY
                           else 25)
        eng.warmup()
        bench_unloaded("r3_baseline", eng, max_wait_ms=25.0,
                       linger_ms=25.0)
        bench_unloaded("linger", eng, max_wait_ms=25.0, linger_ms=2.0)

        eng_bb = build_engine(batch_size=bsz, seq_skip_steps=2 if TINY
                              else 25, batch_buckets=[small, bsz])
        eng_bb.warmup()
        bench_unloaded("linger+bbuckets", eng_bb, max_wait_ms=25.0,
                       linger_ms=2.0)
        _cast_engine_params(eng_bb)
        # recompile against bf16 params happens on first call
        eng_bb.warmup()
        bench_unloaded("linger+bbuckets+bf16", eng_bb, max_wait_ms=25.0,
                       linger_ms=2.0)
        if "burst" in exps:
            bench_burst("tuned", eng_bb, clients=8 if TINY else 64,
                        reqs_per_client=2 if TINY else 6)
            del eng_bb
    elif "burst" in exps:
        eng = build_engine(batch_size=bsz, seq_skip_steps=2 if TINY
                           else 25, batch_buckets=[small, bsz])
        eng.warmup()
        bench_burst("tuned", eng, clients=8 if TINY else 64,
                    reqs_per_client=2 if TINY else 6)
    if "rbucket" in exps:
        bench_rbuckets()


if __name__ == "__main__":
    main()
