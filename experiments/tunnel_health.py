"""Trivial TPU-tunnel health check — run BEFORE trusting any timing.

The tunnel has multi-minute degradation windows (CLAUDE.md): an 8x8
matmul round-trip is normally ~25 ms warm, but reads 3-100+ s (or hangs)
during an outage. This prints cold-connect and warm round-trip times and
exits 0 only when the warm RTT is under the threshold, so scripts can
gate on it:

    timeout 120 python experiments/tunnel_health.py && python bench.py

For CHIP health (compute throughput, not link health) use
experiments/probe_chip.py — and remember its in-program-chain caveat.
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold_s", type=float, default=1.0,
                    help="warm round-trip above this = unhealthy (exit 1)")
    args = ap.parse_args()

    t0 = time.time()
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    s = float(jnp.sum(x @ x))
    cold = time.time() - t0
    t1 = time.time()
    s = float(jnp.sum(x @ x))
    warm = time.time() - t1
    dev = jax.devices()[0]
    ok = warm < args.threshold_s
    print(f"device={dev} cold={cold:.2f}s warm={warm:.3f}s "
          f"({'healthy' if ok else 'DEGRADED'}; checksum {s})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
