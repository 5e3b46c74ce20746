"""Timing / profiling utilities.

IMPORTANT quirk of this environment (documented in BENCHMARKS.md):
``block_until_ready`` can return before device completion when JAX talks
to the TPU through the remote tunnel — a scalar device->host transfer is
the only reliable sync. ``hard_sync`` and ``device_timer`` encode that.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def hard_sync(tree) -> float:
    """Force true device completion; returns a checksum-ish scalar."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


@contextlib.contextmanager
def device_timer(label: str, results: dict | None = None,
                 log_fn=print):
    """Wall-clock a block with a hard device sync at exit.

    with device_timer("sample", results) as box:
        box.append(sampler(...))
    """
    box = []
    start = time.perf_counter()
    try:
        yield box
    finally:
        if box:
            hard_sync(box[-1])
        elapsed = time.perf_counter() - start
        if results is not None:
            results[label] = elapsed
        log_fn(f"[{label}] {elapsed * 1000:.1f} ms")


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """jax.profiler trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
