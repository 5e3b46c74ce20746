"""Round-5 serving benchmark: overload behavior of the bounded queue.

VERDICT r4 weak #1 / next #3: the r3/r4 soaks ran AT capacity; this one
runs sustained load well BEYOND it (closed-loop clients that retry 429s
after the server's Retry-After hint) and proves the backpressure
contract on the real chip:

* overload is rejected fast (429 + Retry-After), not queued toward a
  timeout — reject latency is measured separately from accepted latency;
* accepted requests keep a bounded p99 (the queue bound caps the wait at
  ~max_queue/throughput);
* zero stuck futures / zero non-429 errors; queue depth never exceeds
  the bound.

Appends JSON lines to experiments/r5_results.jsonl. E3DIFF_EXP_TINY=1
for a CPU smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.r3_serving_bench import (  # noqa: E402
    TINY,
    build_engine,
    make_pockets,
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5_results.jsonl")


def log_result(name, **kw):
    rec = {"exp": name, **kw}
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _post(port, payload, timeout=600):
    """Returns (status_code, body_dict, retry_after_or_None)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/design",
        data=json.dumps(payload).encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read()), None
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        ra = e.headers.get("Retry-After")
        return e.code, body, float(ra) if ra else None


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
            "n_designs": 1,
            "return_pdb": False,
        })
    return out


def bench_overload(tag, engine, clients=96, duration_s=60.0,
                   max_queue=128, max_wait_ms=25.0, linger_ms=2.0):
    """Sustained load beyond capacity: `clients` closed-loop clients that
    retry immediately after honoring the server's Retry-After hint."""
    from e3diff_tpu.serving import DesignServer

    server = DesignServer(engine, port=0, max_wait_ms=max_wait_ms,
                          linger_ms=linger_ms, max_queue=max_queue)
    server.start()
    port = server.port
    payloads = _payloads(min(clients, 64))
    ok_lat, rej_lat, errors = [], [], []
    counts = {"ok": 0, "rejected": 0}
    lock = threading.Lock()
    max_depth_seen = [0]
    stop = threading.Event()

    def client(i):
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                code, body, retry_after = _post(
                    port, payloads[i % len(payloads)], timeout=120)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(repr(exc))
                return
            dt = time.perf_counter() - t0
            with lock:
                if code == 200:
                    counts["ok"] += 1
                    ok_lat.append(dt)
                elif code == 429:
                    counts["rejected"] += 1
                    rej_lat.append(dt)
                else:
                    errors.append(f"HTTP {code}: {body}")
                    return
            if code == 429 and retry_after:
                # honor the hint (capped — the test wants sustained
                # overload, not a polite trickle)
                time.sleep(min(retry_after, 0.25))

    def watch_depth():
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/stats", timeout=10) as r:
                    s = json.loads(r.read())
                max_depth_seen[0] = max(max_depth_seen[0],
                                        s.get("queue_depth", 0))
            except Exception:  # noqa: BLE001
                pass
            time.sleep(0.2)

    _post(port, payloads[0])  # warm the HTTP path
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    watcher = threading.Thread(target=watch_depth)
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    watcher.start()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=180)
    stuck = [t for t in threads if t.is_alive()]
    watcher.join(timeout=5)
    wall = time.perf_counter() - t0
    stats = server.batcher.stats()
    server.shutdown()

    def pct(lats, q):
        if not lats:
            return 0.0
        lats = sorted(lats)
        return round(1e3 * lats[min(int(len(lats) * q), len(lats) - 1)], 1)

    log_result(
        "serve_overload", config=tag, clients=clients,
        duration_s=round(wall, 1), max_queue=max_queue,
        accepted=counts["ok"], rejected=counts["rejected"],
        accepted_per_s=round(counts["ok"] / wall, 1),
        reject_ratio=round(
            counts["rejected"] / max(1, counts["ok"] + counts["rejected"]),
            3),
        accepted_ms_p50=pct(ok_lat, 0.5), accepted_ms_p95=pct(ok_lat, 0.95),
        accepted_ms_p99=pct(ok_lat, 0.99),
        reject_ms_p50=pct(rej_lat, 0.5), reject_ms_p99=pct(rej_lat, 0.99),
        max_queue_depth_seen=max_depth_seen[0],
        batcher_rejected=stats["rejected"], errors=len(errors),
        stuck_clients=len(stuck))
    assert not errors, errors[:3]
    assert not stuck, f"{len(stuck)} clients never finished"
    assert max_depth_seen[0] <= max_queue
    return counts


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=96)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--max_queue", type=int, default=128)
    args = ap.parse_args()

    if TINY:
        engine = build_engine(batch_size=4)
        engine.warmup()
        bench_overload("tiny", engine, clients=8, duration_s=5.0,
                       max_queue=8)
        return

    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    # build_engine already sets ddim_steps=25 on the non-TINY path
    engine = build_engine(batch_size=64, seq_skip_steps=25)
    engine.warmup()
    bench_overload("overload_3x", engine, clients=args.clients,
                   duration_s=args.duration, max_queue=args.max_queue)


if __name__ == "__main__":
    main()
