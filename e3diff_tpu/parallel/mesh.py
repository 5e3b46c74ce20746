"""Device mesh + sharding rules for TPU scale-out.

The reference is single-GPU (Lightning devices=[4]; its only distributed
call is a validation all_gather — SURVEY.md §2.17). Here scale-out is a
first-class design: a 2-D ``jax.sharding.Mesh`` with axes

  dp — data parallel: batches sharded on axis 0; XLA inserts the gradient
       psum over ICI automatically under jit;
  tp — tensor parallel (Megatron-style): attention QKV and MLP up-
       projections column-parallel, the following projections row-parallel.
       At the reference's 72-146M scale tp=1 is the right default (models
       fit easily in one chip's HBM), but the rules are real and compile to
       all-reduce collectives — used for the multi-chip dry-run and for
       scaling the architecture up.

Everything goes through plain ``jit`` + ``NamedSharding``: annotate inputs,
let the SPMD partitioner propagate and insert collectives (the
scaling-book recipe). No NCCL/MPI analogue exists or is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels whose OUTPUT features are split across tp (column parallel)
_COL_PARALLEL = {"query", "key", "value", "intermediate_dense", "mlp_dense1"}
# kernels whose INPUT features are split across tp (row parallel);
# their outputs are summed with an all-reduce inserted by XLA
_ROW_PARALLEL = {"output_dense", "mlp_dense2"}


def make_mesh(dp: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    mesh_devices = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(mesh_devices, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are sharded along axis 0 over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def param_sharding_rules(params, mesh: Mesh):
    """PartitionSpec tree for a denoiser parameter tree.

    Column-parallel kernels -> P(..., 'tp') with sharded bias;
    row-parallel kernels -> P(..., 'tp', None) with replicated bias;
    everything else (embeddings, norms, adaLN, heads) replicated.
    Rules are rank-aware so scan_layers trees (kernels carry a leading
    num_layers axis) shard the same feature dimensions. Falls back to
    replication when a dimension is not divisible by the tp extent."""
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if len(names) < 2 or tp == 1:
            return P()
        leaf_name, parent = names[-1], names[-2]
        if leaf_name == "kernel" and parent in _COL_PARALLEL:
            if leaf.shape[-1] % tp == 0:
                return P(*([None] * (leaf.ndim - 1)), "tp")
        elif leaf_name == "kernel" and parent in _ROW_PARALLEL:
            if leaf.shape[-2] % tp == 0:
                return P(*([None] * (leaf.ndim - 2)), "tp", None)
        elif leaf_name == "bias" and parent in _COL_PARALLEL:
            if leaf.shape[-1] % tp == 0:
                return P(*([None] * (leaf.ndim - 1)), "tp")
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    specs = param_sharding_rules(params, mesh)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    from e3diff_tpu.data.dataset import strip_meta

    sharding = batch_sharding(mesh)
    return {k: jax.device_put(np.asarray(v), sharding)
            for k, v in strip_meta(batch).items()}
