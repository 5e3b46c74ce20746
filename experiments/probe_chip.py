"""Chip-health probe: one JSON line with the tunnel RTT and the big-
matmul bf16 throughput (matmuls chained INSIDE one jitted fori_loop —
separate jit calls pay ~4-5 ms per-program tunnel overhead each, which
caps an out-of-program probe at ~30 "TFLOP/s" no matter how fast the
chip is; that methodology artifact was once misread as chip
degradation). Nominal: ~175 TFLOP/s (BENCHMARKS.md chip
characterization).

A LOW reading means either real foreign load on the shared chip or —
far more likely — ANOTHER TPU CLIENT IN THIS CONTAINER: a second live
client (stale serve.py, a concurrent experiment, even this probe run
against a running measurement) serializes program execution through the
tunnel and inflates step times ~12x. Check `ps` before timing anything.

    python experiments/probe_chip.py          # {"tflops": ..., "rtt_ms": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n_mm: int = 256, n_rtt: int = 5) -> dict:
    # n_mm=256 matmuls inside the loop ≈ 200 ms of compute at nominal
    # speed, so the one ~25 ms call round trip undercounts by ~10%, not 3x
    import jax
    import jax.numpy as jnp

    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a + 1.0)
    y = f(x)
    float(jnp.sum(y))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_rtt):
        y = f(y)
        float(jnp.sum(y))  # hard sync per call
    rtt_ms = (time.perf_counter() - t0) / n_rtt * 1000

    # scale so chained products stay finite in bf16 (ones would hit inf
    # after 4 matmuls: entries grow as 4096^(2^k-1)); 4096 * (1/64)^2 = 1
    # keeps every chained product at 1/64. The chain runs INSIDE one
    # program: per-program tunnel overhead (~4-5 ms) would otherwise
    # dominate the 0.8 ms matmul and cap the reading at ~30.
    a = jnp.full((4096, 4096), 1.0 / 64.0, jnp.bfloat16)

    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(
            0, n_mm, lambda _, x: (x @ x) * jnp.bfloat16(1.0 / 64.0), m)

    b = chain(a)
    float(jnp.sum(b.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    b = chain(a)
    checksum = float(jnp.sum(b.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    import math
    assert math.isfinite(checksum), f"probe checksum not finite: {checksum}"
    tflops = n_mm * 2 * 4096 ** 3 / dt / 1e12
    return {"tflops": round(tflops, 1), "rtt_ms": round(rtt_ms, 1),
            "platform": jax.devices()[0].platform}


if __name__ == "__main__":
    rec = probe()
    print(json.dumps(rec))
    # exit 0 = healthy, 1 = degraded (nominal ~175 TFLOP/s on this chip)
    sys.exit(0 if rec["tflops"] > 140 else 1)
