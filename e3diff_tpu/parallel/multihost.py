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

This module is exercised in single-process mode by the test suite; the
multi-process branch follows the documented JAX API contract (cannot be
executed in a one-host environment, by construction).
"""

from __future__ import annotations

import jax
import numpy as np

from e3diff_tpu.parallel.mesh import batch_sharding


def host_local_slice(n_examples: int, process_index: int | None = None,
                     process_count: int | None = None) -> slice:
    """The contiguous row range this host should load."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_examples // pc
    return slice(pi * per, (pi + 1) * per)


def distribute_batch(local_batch: dict, mesh) -> dict:
    """Host-local numpy batch -> globally sharded device arrays.

    In single-process mode this is a plain device_put with the dp
    sharding; in multi-process mode each host contributes its local rows.
    """
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        if k in ("num_valid", "structure_ids"):
            continue
        v = np.asarray(v)
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, global_shape)
    return out
