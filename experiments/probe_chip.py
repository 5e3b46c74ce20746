"""Chip-health probe: one JSON line with the tunnel RTT and the big-
matmul bf16 throughput. The shared v5e behind the axon tunnel degrades
under other tenants' load (measured: 175 TFLOP/s nominal vs 20-43 while
degraded, which inflates a 95.9 ms train step to 1.2-13 s) — run this
BEFORE trusting any perf measurement.

    python experiments/probe_chip.py          # {"tflops": ..., "rtt_ms": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n_mm: int = 10, n_rtt: int = 5) -> dict:
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
    # keeps every chained product exactly all-ones
    a = jnp.full((4096, 4096), 1.0 / 64.0, jnp.bfloat16)
    g = jax.jit(lambda m: (m @ m) * (1.0 / 64.0))
    b = g(a)
    float(jnp.sum(b.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    b = g(a)
    for _ in range(n_mm - 1):
        b = g(b)   # dependent chain: no dispatch pipelining illusions
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
