"""Persistent XLA compilation cache.

Cold compiles through this environment's remote-TPU tunnel cost 30-340 s
per program (BENCHMARKS.md). JAX's persistent compilation cache
serializes compiled executables to disk keyed by (program, flags,
topology), so a second process running the same jitted program — the
common case for the CLI scripts, bench.py, and repeated experiment
sweeps — skips compilation entirely. Verified working against the axon
backend (cache entries are written and reloaded).

Enabled by every CLI entry point. Opt out / relocate with
``E3DIFF_COMPILE_CACHE=0`` or ``E3DIFF_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/e3diff_tpu/xla")
_OFF = ("0", "off", "false", "none")


def enable_persistent_compilation_cache(cache_dir: str | None = None):
    """Turn on JAX's on-disk compilation cache. Returns the cache dir,
    or None when disabled via E3DIFF_COMPILE_CACHE=0.

    Safe to call multiple times and before/after backend initialization;
    only programs that take >= 2 s to compile are persisted (everything
    interesting here does)."""
    env = os.environ.get("E3DIFF_COMPILE_CACHE", "")
    if env.lower() in _OFF:
        return None
    if env.lower() in ("1", "true", "yes", "on"):
        env = ""   # force-enable spelling, not a directory named "1"
    if cache_dir is None:
        cache_dir = env if env else _DEFAULT_DIR

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
