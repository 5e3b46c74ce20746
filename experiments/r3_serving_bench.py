"""Round-3 serving benchmark: the full design pipeline under load.

Measures the serving subsystem end-to-end on the real chip with
full-size models (146M structure + 61M sequence, random-init — serving
cost is weight-independent), appending JSON lines to r3_results.jsonl:

* serve_engine   — DesignEngine.design_records throughput at B=64
                   serving shapes (pocket featurize -> DDIM-25 angles ->
                   50-step inverse fold -> NERF PDB text), with and
                   without PDB reconstruction.
* serve_http     — DesignServer + MicroBatcher under 64 concurrent HTTP
                   clients: requests/s, latency percentiles, mean batch
                   occupancy.
* serve_latency  — single unloaded request latency (the interactive
                   floor: one micro-batch window + one device run).

Results are host-materialized (numpy / JSON responses), so wall-clock
timing is inherently hard-synced — no block_until_ready caveats.
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

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_results.jsonl")
TINY = os.environ.get("E3DIFF_EXP_TINY") == "1"


def log_result(name, **kw):
    rec = {"exp": name, **kw}
    if not TINY:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def build_engine(batch_size=64, **engine_kw):
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.diffusion import D3PMDiffusion, GaussianAngleDiffusion
    from e3diff_tpu.models import (
        SequenceDenoiser,
        StructureDenoiser,
        TransformerConfig,
    )
    from e3diff_tpu.ops import UniformTransition
    from e3diff_tpu.serving import DesignEngine
    from e3diff_tpu.utils.presets import ExperimentConfig

    max_len, lig = 64, 16
    base = dict(hidden_size=768, num_heads=12, num_layers=12,
                intermediate_size=1024, max_position_embeddings=max_len,
                dropout=0.1, attention_dropout=0.1,
                position_embedding_type="relative_key",
                dtype=jnp.bfloat16)
    qlayers = 6
    if TINY:
        base.update(hidden_size=64, num_heads=4, num_layers=2,
                    intermediate_size=128, dtype=jnp.float32)
        qlayers = 1

    def cfgs(layers, style):
        enc = TransformerConfig(**{**base, "num_layers": layers},
                                add_cross_attention=False,
                                init_style=style)
        dec = TransformerConfig(**{**base, "num_layers": layers},
                                add_cross_attention=True, init_style=style)
        return enc, dec

    cfg = ExperimentConfig(pocket_ext=0, max_seq_len=max_len,
                           ligand_max_len=lig,
                           timesteps=8 if TINY else 1000,
                           bf16=not TINY)
    smodel = StructureDenoiser(*cfgs(base["num_layers"], "torch_default"))
    qmodel = SequenceDenoiser(*cfgs(qlayers, "xavier_all"))

    b = batch_size
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros
    sparams = jax.jit(smodel.init)(
        rng, z((b,), jnp.int32), z((b, lig, 8)), jnp.ones((b, lig)),
        z((b, max_len, 20)), z((b, max_len, 8)),
        jnp.ones((b, max_len)))["params"]
    qparams = jax.jit(qmodel.init)(
        rng, z((b, 1)), z((b, lig, 20)), z((b, lig, 8)),
        jnp.ones((b, lig)), z((b, max_len, 20)), z((b, max_len, 8)),
        jnp.ones((b, max_len)))["params"]

    sdiff = GaussianAngleDiffusion.cosine(cfg.timesteps)
    d3pm = D3PMDiffusion.create(UniformTransition(20),
                                timesteps=6 if TINY else 50)
    return DesignEngine(cfg, smodel, sparams, sdiff, qmodel, qparams,
                        d3pm, batch_size=batch_size, sampler="ddim",
                        ddim_steps=3 if TINY else 25, **engine_kw)


def make_pockets(n, seed=0):
    from e3diff_tpu.data.dataset import AA_VOCAB
    from e3diff_tpu.serving import pocket_record

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        np_res = int(rng.integers(30, 60)) if not TINY else 8
        pep = int(rng.integers(8, 17)) if not TINY else 5
        seq = "".join(AA_VOCAB[i] for i in rng.integers(0, 20, np_res))
        angles = rng.uniform(-np.pi, np.pi, (np_res, 8)).astype(np.float32)
        out.append(pocket_record(seq, angles, pep))
    return out


def bench_engine(engine, rounds=4, skip=False):
    import jax

    records = make_pockets(engine.batch_size)
    n_peptides = engine.batch_size
    for return_pdb in (True, False):
        # warm this exact path once (first call pays compile)
        engine.design_records(records[:1], key=jax.random.PRNGKey(0),
                              return_pdb=return_pdb)
        times = []
        for r in range(rounds):
            t0 = time.perf_counter()
            res = engine.design_records(records,
                                        key=jax.random.PRNGKey(r),
                                        return_pdb=return_pdb)
            times.append(time.perf_counter() - t0)
            assert len(res) == n_peptides
        best = min(times)
        log_result("serve_engine_skip25" if skip else "serve_engine",
                   return_pdb=return_pdb,
                   batch=n_peptides, s_per_batch=round(best, 4),
                   designs_per_s=round(n_peptides / best, 1),
                   times=[round(t, 4) for t in times])


def _post(port, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/design",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def bench_http(engine, clients=64, reqs_per_client=4, max_wait_ms=10.0):
    from e3diff_tpu.serving import DesignServer

    server = DesignServer(engine, port=0, max_wait_ms=max_wait_ms)
    server.start()
    port = server.port
    pockets = make_pockets(clients, seed=7)
    payloads = []
    for p in pockets:
        n_pocket = int(np.asarray(p["pocket_mask"]).sum())
        payloads.append({
            "pocket": {
                "sequence": "".join(p["amino_acid"][:n_pocket]),
                "angles": np.asarray(
                    p["angle_features"][:n_pocket]).tolist(),
                "peptide_length": int(np.asarray(p["ligand_mask"]).sum()),
            },
            "return_pdb": False,
        })
    try:
        # unloaded single-request latency
        lat = []
        for i in range(3):
            t0 = time.perf_counter()
            _post(port, payloads[i % len(payloads)])
            lat.append(time.perf_counter() - t0)
        log_result("serve_latency", unloaded_ms=round(1e3 * min(lat), 1))

        errors = []

        def client(i):
            try:
                for _ in range(reqs_per_client):
                    body = _post(port, payloads[i])
                    assert body["designs"][0]["sequence"]
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = server.batcher.stats()
        assert not errors, errors[:3]
        total = clients * reqs_per_client
        log_result("serve_http", clients=clients, requests=total,
                   max_wait_ms=max_wait_ms,
                   wall_s=round(wall, 3),
                   requests_per_s=round(total / wall, 1),
                   latency_ms_p50=round(stats.get("latency_ms_p50", 0), 1),
                   latency_ms_p95=round(stats.get("latency_ms_p95", 0), 1),
                   mean_batch_occupancy=round(
                       stats["mean_batch_occupancy"], 1))
    finally:
        server.shutdown()


def bench_soak(engine, seconds=120, clients=32):
    """Mixed /design + /inverse_fold traffic from closed-loop clients for
    a sustained window: validates the two micro-batch queues interleave
    safely on one chip (shared device lock) with zero errors."""
    from e3diff_tpu.serving import DesignServer

    server = DesignServer(engine, port=0, max_wait_ms=15.0)
    server.start()
    port = server.port
    pockets = make_pockets(clients, seed=11)
    design_payloads, if_payloads = [], []
    for i, p in enumerate(pockets):
        n_pocket = int(np.asarray(p["pocket_mask"]).sum())
        pocket = {"sequence": "".join(p["amino_acid"][:n_pocket]),
                  "angles": np.asarray(
                      p["angle_features"][:n_pocket]).tolist(),
                  "peptide_length": int(np.asarray(p["ligand_mask"]).sum())}
        design_payloads.append({"pocket": pocket,
                                "return_pdb": bool(i % 2)})
        if_payloads.append({"record": {
            "amino_acid": list(p["amino_acid"]),
            "angle_features": np.asarray(p["angle_features"]).tolist(),
            "ligand_mask": np.asarray(p["ligand_mask"]).astype(
                int).tolist(),
            "pocket_mask": np.asarray(p["pocket_mask"]).astype(
                int).tolist()}, "n_samples": 2})
    counts = {"design": 0, "inverse_fold": 0}
    errors = []
    deadline = time.perf_counter() + seconds
    lock = threading.Lock()

    def client(i):
        kind = "design" if i % 2 == 0 else "inverse_fold"
        payload = (design_payloads if kind == "design"
                   else if_payloads)[i % len(pockets)]
        while time.perf_counter() < deadline:
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/{kind}",
                    data=json.dumps(payload).encode(), method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
                with lock:
                    counts[kind] += 1
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))
                return

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    try:
        stats = server.batcher.stats()
        if_stats = server.if_batcher.stats()
        log_result("serve_soak", seconds=round(wall, 1), clients=clients,
                   design_reqs=counts["design"],
                   inverse_fold_reqs=counts["inverse_fold"],
                   total_req_per_s=round(
                       (counts["design"] + counts["inverse_fold"]) / wall,
                       1),
                   errors=len(errors), error_sample=errors[:2],
                   design_occupancy=round(
                       stats["mean_batch_occupancy"], 1),
                   if_occupancy=round(
                       if_stats["mean_batch_occupancy"], 1))
    finally:
        server.shutdown()


def main():
    import argparse

    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", default="engine,http",
                        help="comma list of: engine, http, http_tuned, "
                             "engine_skip, soak")
    exps = set(parser.parse_args().exps.split(","))

    if not TINY:
        enable_persistent_compilation_cache()
    skip = "engine_skip" in exps
    engine = build_engine(batch_size=8 if TINY else 64,
                          **({"seq_skip_steps": 2 if TINY else 25}
                             if skip else {}))
    t0 = time.perf_counter()
    engine.warmup()
    log_result("serve_warmup", s=round(time.perf_counter() - t0, 1))
    if "engine" in exps or skip:
        bench_engine(engine, rounds=2 if TINY else 4, skip=skip)
    if "http" in exps:
        bench_http(engine, clients=8 if TINY else 64,
                   reqs_per_client=2 if TINY else 4)
    if "soak" in exps:
        bench_soak(engine, seconds=5 if TINY else 120,
                   clients=8 if TINY else 32)
    if "http_tuned" in exps:
        # larger coalescing window: a partial batch costs the same device
        # time as a full one (fixed shapes), so waiting longer under
        # closed-loop load trades p50 for occupancy/throughput
        bench_http(engine, clients=8 if TINY else 64,
                   reqs_per_client=2 if TINY else 8, max_wait_ms=60.0)


if __name__ == "__main__":
    main()
