"""Multi-process worker: one of two real OS processes in the spawned
jax.distributed job (tests/test_multihost_spawn.py).

Exercises the REAL multi-process branch of e3diff_tpu.parallel.multihost
— the TPU-native equivalent of the reference's one distributed call
(structure_model/model.py:344 `self.all_gather`) — on the CPU backend:
each process owns 4 virtual devices (XLA_FLAGS set by the spawner),
loads only its host_local_slice of the global batch, assembles global
arrays with distribute_batch, runs dp-sharded train steps SPMD, and
participates in a collective orbax checkpoint save.

Usage: python tests/_multihost_worker.py PORT PROCESS_ID NUM_PROCESSES OUT_DIR
"""

import json
import os
import sys

import numpy as np


def main():
    port, pid, nproc, out_dir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    # the sitecustomize hook forces jax_platforms="axon,cpu"; this worker
    # must NEVER touch the (single-client) TPU tunnel
    jax.config.update("jax_platforms", "cpu")

    from e3diff_tpu.parallel.multihost import (
        distribute_batch,
        host_batch_rows,
        host_local_slice,
        initialize_multihost,
        pad_local_batch,
    )

    pi, pc = initialize_multihost(f"localhost:{port}", nproc, pid)
    assert (pi, pc) == (pid, nproc), (pi, pc)
    assert jax.local_device_count() * nproc == jax.device_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from _multihost_scenario import N_ROWS, build, run_steps
    from e3diff_tpu.parallel import make_mesh
    from e3diff_tpu.training.checkpoint import CheckpointManager

    model, diffusion, trainer, batch = build()
    mesh = make_mesh(dp=jax.device_count(), tp=1)

    # every process computes an identical local state (seeded init), then
    # replicates it onto the global mesh — multi-process jit requires
    # every input to be a global array
    state = trainer.create_state(jax.random.PRNGKey(42), batch)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    # each host loads ITS rows only, pads to the common per-host count,
    # and contributes them to globally dp-sharded device arrays
    sl = host_local_slice(N_ROWS)
    local = {k: np.asarray(v)[sl] for k, v in batch.items()}
    local = pad_local_batch(local, host_batch_rows(N_ROWS))
    local.pop("num_valid", None)
    gbatch = distribute_batch(local, mesh, global_rows=N_ROWS)

    state, losses = run_steps(trainer, state, gbatch)

    # collective orbax save: all processes participate (the manager's
    # snapshot path self-disables at process_count > 1)
    mgr = CheckpointManager(os.path.join(out_dir, "ckpt"))
    mgr.save("final", {"params": state.params}, block=True)
    mgr.close()

    with open(os.path.join(out_dir, f"losses_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "process_index": pi,
                   "process_count": pc,
                   "local_devices": jax.local_device_count()}, f)
    print(f"worker {pid}: OK {losses}", flush=True)


if __name__ == "__main__":
    main()
