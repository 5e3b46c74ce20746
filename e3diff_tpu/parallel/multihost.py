"""Multi-host (multi-process) input distribution.

Single-slice multi-chip needs nothing beyond `shard_batch` (one process
owns all devices). On multi-host topologies (v5e-16 pods and beyond, or
multi-slice over DCN), each process loads ITS shard of the global batch
and assembles a global array:

* data is sharded per host by `host_local_slice` (every process reads only
  its rows — the host-parallel replacement for the reference's
  DataLoader(num_workers=16));
* `distribute_batch` builds global device arrays via
  `jax.make_array_from_process_local_data`, the standard JAX multihost
  recipe; XLA then runs the same jitted train step SPMD across all hosts
  with gradient psum over ICI/DCN.

Both branches are executed by the test suite. The multi-process branch
runs for real in tests/test_multihost_spawn.py: two spawned OS processes
(4 virtual CPU devices each) join one jax.distributed job via
`initialize_multihost`, slice + distribute a global batch, take
dp-sharded train steps, and collectively save a checkpoint that restores
single-process — asserted equal to the single-process trajectory.
(An earlier revision of this docstring claimed the branch could not be
tested on one host; that was wrong — `jax.distributed.initialize`
accepts N local processes with a localhost coordinator.)
"""

from __future__ import annotations

import jax
import numpy as np

from e3diff_tpu.data.dataset import BATCH_META_KEYS, strip_meta

from e3diff_tpu.parallel.mesh import batch_sharding


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed for multi-process (multi-host) runs.

    Call BEFORE any computation touches a backend (train CLIs expose
    --multihost which does). On TPU pods all three arguments are
    auto-detected from the environment by JAX (initialize is always
    attempted — the flag is an explicit opt-in); elsewhere pass them or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    Already-initialized runtimes and explicit num_processes=1 are
    no-ops; when nothing was configured AND no cluster is detectable the
    failure downgrades to a single-process warning. Returns
    (process_index, process_count).
    """
    import os

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if not already and num_processes != 1:
        # ALWAYS attempt initialization (the caller opted in): on TPU
        # pods / managed clusters jax auto-detects everything from the
        # environment when the args are None. Only an environment with
        # nothing to detect fails — fall back to single-process with a
        # warning rather than crashing a plain single-host run.
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except Exception as e:
            # any of the three configured means the caller expected a
            # cluster — fail loudly (a silent downgrade would let one
            # pod worker train alone)
            if (coordinator_address is not None or num_processes is not None
                    or process_id is not None):
                raise
            import warnings

            warnings.warn(
                f"initialize_multihost: no cluster detected ({e!r}); "
                "continuing single-process.", stacklevel=2)
    return jax.process_index(), jax.process_count()


def host_local_slice(n_examples: int, process_index: int | None = None,
                     process_count: int | None = None) -> slice:
    """The contiguous row range this host should load.

    Covers ALL rows — no silent remainder drop: with r = n % pc, the
    first r hosts take per+1 rows, the rest per. When r != 0 the local
    sizes differ by one; pad every host to `host_batch_rows(n)` with
    `pad_local_batch` before `distribute_batch` (the JAX multihost
    contract needs identical local shapes on every process)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per, rem = divmod(n_examples, pc)
    start = pi * per + min(pi, rem)
    return slice(start, start + per + (1 if pi < rem else 0))


def host_batch_rows(n_examples: int, process_count: int | None = None) -> int:
    """Per-host row count after padding: ceil(n / process_count)."""
    pc = jax.process_count() if process_count is None else process_count
    return -(-n_examples // pc)


def pad_local_batch(local_batch: dict, target_rows: int) -> dict:
    """Zero-pad every array in a host-local batch to `target_rows` rows.

    Padded rows have all-zero attention masks, so they contribute nothing
    to the masked losses/metrics; the true row count is recorded in
    `num_valid`. Raises if the batch already exceeds `target_rows`."""
    out = {}
    rows = None
    for k, v in local_batch.items():
        if k in BATCH_META_KEYS:
            if k == "structure_ids":
                out[k] = v
            continue
        v = np.asarray(v)
        if rows is None:
            rows = v.shape[0]
        if v.shape[0] > target_rows:
            raise ValueError(
                f"batch has {v.shape[0]} rows > target {target_rows}")
        pad = ((0, target_rows - v.shape[0]),) + ((0, 0),) * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    out["num_valid"] = min(int(local_batch.get("num_valid", rows)), rows)
    return out


def distribute_batch(local_batch: dict, mesh,
                     global_rows: int | None = None) -> dict:
    """Host-local numpy batch -> globally sharded device arrays.

    In single-process mode this is a plain device_put with the dp
    sharding; in multi-process mode each host contributes its local rows.

    Multi-process callers MUST give every host the same local row count
    (`host_local_slice` sizes differ by one when n % process_count != 0 —
    pad with `pad_local_batch(batch, host_batch_rows(n))` first). The
    global shape is derived from the local row count, so divergent local
    sizes would mean divergent global shapes across processes (a hang or
    crash inside jax.make_array_from_process_local_data). Pass
    `global_rows=n` (the pre-slice total) to have that contract checked
    here instead of failing deep in the runtime.
    """
    sharding = batch_sharding(mesh)
    pc = jax.process_count()
    out = {}
    rows = {np.asarray(v).shape[0]
            for v in strip_meta(local_batch).values()}
    if len(rows) > 1:
        raise ValueError(f"inconsistent row counts across batch keys: {rows}")
    if pc > 1 and global_rows is not None and rows:
        expected = host_batch_rows(global_rows)
        if next(iter(rows)) != expected:
            raise ValueError(
                f"local batch has {next(iter(rows))} rows but "
                f"host_batch_rows({global_rows}) = {expected}; pad with "
                f"pad_local_batch before distribute_batch")
    for k, v in strip_meta(local_batch).items():
        v = np.asarray(v)
        if pc == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            global_shape = (v.shape[0] * pc,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, global_shape)
    return out
