"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
from e3diff_tpu.diffusion import GaussianAngleDiffusion
from e3diff_tpu.models import StructureDenoiser, TransformerConfig
from e3diff_tpu.parallel import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)
from e3diff_tpu.training import StructureTrainer, make_optimizer

MAXLEN = 16


def _cfg(cross):
    return TransformerConfig(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        max_position_embeddings=MAXLEN, dropout=0.0, attention_dropout=0.0,
        add_cross_attention=cross)


def _batch(n=8):
    ds = LigandBindingSiteData(
        synthetic_complexes(n=n, seed=21, receptor_len_range=(8, 12),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1)
    b = next(ds.batches(n))
    return {k: v for k, v in b.items()
            if k not in ("num_valid", "structure_ids")}


def test_mesh_and_rules():
    assert jax.device_count() == 8
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}

    model = StructureDenoiser(_cfg(False), _cfg(True))
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    specs = param_sharding_rules(params, mesh)
    enc0 = specs["encoder"]["layer_0"]
    assert enc0["attention"]["self"]["query"]["kernel"] == P(None, "tp")
    assert enc0["attention"]["output_dense"]["kernel"] == P("tp", None)
    assert enc0["intermediate_dense"]["kernel"] == P(None, "tp")
    assert specs["timestep_projector"]["W"] == P()


def test_dp_tp_train_step_matches_single_device():
    """One sharded train step over (dp=4, tp=2) produces the same params as
    the unsharded step (same rng)."""
    mesh = make_mesh(dp=4, tp=2)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(50)
    batch = _batch()

    rng = jax.random.PRNGKey(42)
    params = model.init(rng, jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    trainer = StructureTrainer(
        model, diff, make_optimizer(params, base_lr=1e-3,
                                    max_epochs=10, steps_per_epoch=5))

    # single-device (copy params: train_step donates its state argument)
    state1 = trainer.create_state(rng, batch)
    state1 = state1.replace(params=jax.tree.map(jnp.copy, params))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, metrics1 = trainer.train_step(state1, dict(jbatch), rng)

    # sharded
    state2 = trainer.create_state(rng, batch)
    state2 = state2.replace(params=shard_params(params, mesh),
                            opt_state=jax.tree.map(
                                lambda x: x, state2.opt_state))
    sbatch = shard_batch(batch, mesh)
    state2, metrics2 = trainer.train_step(state2, sbatch, rng)

    np.testing.assert_allclose(float(metrics1["train_loss"]),
                               float(metrics2["train_loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_sharded_params_layouts():
    mesh = make_mesh(dp=2, tp=4)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    batch = _batch()
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    sharded = shard_params(params, mesh)
    qk = sharded["encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"]
    # each tp shard holds 1/4 of the output features
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    assert shard_shapes == {(64, 16)}


def test_scan_layers_dp_tp_train_step_matches_single_device():
    """The dp x tp sharded step also reproduces the single-device step when
    the stacks are nn.scan'ed (rank-3 kernels; rank-aware sharding rules)."""
    import dataclasses

    from e3diff_tpu.models.restack import params_to_scan
    from jax.sharding import NamedSharding

    mesh = make_mesh(dp=4, tp=2)
    scan_cfg = lambda cross: dataclasses.replace(_cfg(cross), scan_layers=True)
    model = StructureDenoiser(scan_cfg(False), scan_cfg(True))
    diff = GaussianAngleDiffusion.cosine(50)
    batch = _batch()

    rng = jax.random.PRNGKey(17)
    params = model.init(rng, jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    # scan kernels carry the layer axis; tp must still split features
    qk_spec = param_sharding_rules(params, mesh)[
        "decoder"]["layers"]["layer"]["attention"]["self"]["query"]["kernel"]
    assert qk_spec == P(None, None, "tp")

    trainer = StructureTrainer(
        model, diff, make_optimizer(params, base_lr=1e-3,
                                    max_epochs=10, steps_per_epoch=5))
    state1 = trainer.create_state(rng, batch)
    state1 = state1.replace(params=jax.tree.map(jnp.copy, params))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, metrics1 = trainer.train_step(state1, dict(jbatch), rng)

    state2 = trainer.create_state(rng, batch)
    state2 = state2.replace(params=shard_params(params, mesh))
    state2, metrics2 = trainer.train_step(state2, shard_batch(batch, mesh),
                                          rng)
    np.testing.assert_allclose(float(metrics1["train_loss"]),
                               float(metrics2["train_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_multihost_single_process_path():
    from e3diff_tpu.parallel.multihost import distribute_batch, host_local_slice

    mesh = make_mesh(dp=8, tp=1)
    batch = _batch(8)
    out = distribute_batch(batch, mesh)
    assert set(out) == set(batch)
    for k, v in out.items():
        assert v.shape == batch[k].shape
        np.testing.assert_allclose(np.asarray(v), batch[k])
    sl = host_local_slice(64, process_index=0, process_count=1)
    assert sl == slice(0, 64)
    sl = host_local_slice(64, process_index=2, process_count=4)
    assert sl == slice(32, 48)


def test_host_local_slice_uneven_covers_all_rows():
    """n % process_count != 0 must not silently drop rows: the slices
    tile [0, n) exactly, with sizes differing by at most one."""
    for n, pc in [(67, 4), (5, 8), (64, 4), (63, 16), (1, 2)]:
        slices = [host_local_slice_for(n, i, pc) for i in range(pc)]
        covered = []
        for sl in slices:
            covered.extend(range(n)[sl])
        assert covered == list(range(n)), (n, pc, slices)
        sizes = [len(range(n)[sl]) for sl in slices]
        assert max(sizes) - min(sizes) <= 1


def host_local_slice_for(n, pi, pc):
    from e3diff_tpu.parallel.multihost import host_local_slice
    return host_local_slice(n, process_index=pi, process_count=pc)


def test_pad_local_batch_multiprocess_shapes():
    """Mocked 4-process split of 67 rows: after pad_local_batch every host
    has identical shapes (the make_array_from_process_local_data contract)
    and padded rows carry all-zero attention masks."""
    from e3diff_tpu.parallel.multihost import (
        host_batch_rows, host_local_slice, pad_local_batch)

    n, pc = 67, 4
    ds = LigandBindingSiteData(
        synthetic_complexes(n=n, seed=5, receptor_len_range=(8, 12),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1)
    full = next(ds.batches(n))
    full = {k: v for k, v in full.items()
            if k not in ("num_valid", "structure_ids")}

    target = host_batch_rows(n, process_count=pc)
    assert target == 17
    shapes_by_host = []
    recovered = {k: [] for k in full}
    for pi in range(pc):
        sl = host_local_slice(n, process_index=pi, process_count=pc)
        local = {k: np.asarray(v)[sl] for k, v in full.items()}
        padded = pad_local_batch(local, target)
        nv = padded.pop("num_valid")
        assert nv == len(range(n)[sl])
        shapes_by_host.append({k: v.shape for k, v in padded.items()})
        # padded rows must be inert under masked losses
        np.testing.assert_array_equal(
            padded["ligand_attn_mask"][nv:], 0.0)
        np.testing.assert_array_equal(
            padded["receptor_attn_mask"][nv:], 0.0)
        for k in full:
            recovered[k].append(padded[k][:nv])
    assert all(s == shapes_by_host[0] for s in shapes_by_host)
    for k in full:  # concatenated valid rows == the original global batch
        np.testing.assert_array_equal(
            np.concatenate(recovered[k]), np.asarray(full[k]))


def test_mesh_sharded_sampling_matches_single_device():
    """Batched sampling sweep over the mesh: sharding the batch over dp
    must reproduce single-device samples bit-for-bit (same keys)."""
    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.sampling.structure import make_structure_sampler

    mesh = make_mesh(dp=8, tp=1)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    # single step: sharded reductions reorder floats, and the wrap
    # discontinuity amplifies drift chaotically over many steps
    diff = GaussianAngleDiffusion.cosine(1)
    batch = _batch(8)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    sampler = make_structure_sampler(model, diff, return_trajectory=False)
    key = jax.random.PRNGKey(3)

    single, _ = sampler(params, jbatch, key)
    sharded_batch = shard_batch(batch, mesh)
    sharded, _ = sampler(params, sharded_batch, key)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-4)


def test_tp_sharded_sampling_matches_single_device():
    """The Megatron tp rules must hold INSIDE the sampler scan too, not
    just in train steps: a (dp=4, tp=2)-sharded structure sampler
    reproduces the single-device samples (single step — float reorder
    noise only)."""
    from e3diff_tpu.sampling.structure import make_structure_sampler

    mesh = make_mesh(dp=4, tp=2)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(1)
    batch = _batch(8)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    sampler = make_structure_sampler(model, diff, return_trajectory=False)
    key = jax.random.PRNGKey(3)

    single, _ = sampler(params, jbatch, key)
    sharded, _ = sampler(shard_params(params, mesh),
                         shard_batch(batch, mesh), key)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-4)


def test_tp_sharded_sequence_sampler_matches_single_device():
    """tp-sharded D3PM sampler: the final raw logits (deterministic given
    the scan trajectory) match single-device within float-reorder noise."""
    from e3diff_tpu.diffusion import D3PMDiffusion
    from e3diff_tpu.models import SequenceDenoiser
    from e3diff_tpu.ops import BlosumTransition
    from e3diff_tpu.sampling.sequence import make_sequence_sampler

    mesh = make_mesh(dp=4, tp=2)
    model = SequenceDenoiser(_cfg(False), _cfg(True))
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=2)
    batch = _batch(8)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 1)),
        *[jnp.asarray(batch[k]) for k in
          ["ligand_seq", "ligand_angles", "ligand_attn_mask",
           "receptor_seq", "receptor_angles", "receptor_attn_mask"]]
    )["params"]
    sampler = make_sequence_sampler(model, d3pm, diverse=True)
    key = jax.random.PRNGKey(5)

    single = sampler(params, jbatch, key)
    sharded = sampler(shard_params(params, mesh),
                      shard_batch(batch, mesh), key)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=2e-4, rtol=1e-4)


def test_dp_sharded_sampling_statistical_equivalence_t50():
    """VERDICT r2 item 3a: beyond the T=1 bit-equality check — run the
    FULL 50-step sampler dp-sharded on a briefly-trained model and assert
    the per-feature angle marginals stay within sampling noise of the
    single-device sampler's (noise floor calibrated by a second
    single-device run with a different key)."""
    from e3diff_tpu.sampling.structure import make_structure_sampler

    mesh = make_mesh(dp=8, tp=1)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(50)
    batch = _batch(32)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(7)
    params = model.init(rng, jnp.zeros((32,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    # a few train steps so the sampled distribution is model-shaped, not
    # just wrapped noise (a broken sharding has something to disagree with)
    trainer = StructureTrainer(
        model, diff, make_optimizer(params, base_lr=2e-3,
                                    max_epochs=10, steps_per_epoch=5))
    state = trainer.create_state(rng, batch)
    state = state.replace(params=params)
    for i in range(10):
        rng, srng = jax.random.split(rng)
        state, _ = trainer.train_step(state, dict(jbatch), srng)
    params = state.params

    sampler = make_structure_sampler(model, diff, return_trajectory=False)
    mask = np.asarray(batch["ligand_attn_mask"]).astype(bool)

    def marginals(x):
        """(B, L, 8) -> (8, n_bins) per-feature angle histograms over
        valid ligand positions."""
        x = np.asarray(x, np.float64)
        hists = []
        for f in range(8):
            h, _ = np.histogram(x[..., f][mask], bins=12,
                                range=(-np.pi, np.pi))
            hists.append(h / max(h.sum(), 1))
        return np.stack(hists)

    def tv(a, b):
        return 0.5 * np.abs(a - b).sum(-1)

    single1, _ = sampler(params, jbatch, jax.random.PRNGKey(11))
    single2, _ = sampler(params, jbatch, jax.random.PRNGKey(12))
    sharded, _ = sampler(params, shard_batch(batch, mesh),
                         jax.random.PRNGKey(13))
    assert np.isfinite(np.asarray(sharded)).all()
    assert (np.abs(np.asarray(sharded)) <= np.pi + 1e-5).all()

    m1, m2, ms = marginals(single1), marginals(single2), marginals(sharded)
    noise_floor = tv(m1, m2)          # two single-device keys
    tv_sharded = tv(ms, m1)
    # sharded sampling is another draw from the same distribution: its TV
    # to a single-device draw must be comparable to the key-to-key noise
    assert tv_sharded.max() < max(0.3, noise_floor.max() + 0.15), (
        tv_sharded, noise_floor)
    assert tv_sharded.mean() < noise_floor.mean() + 0.1, (
        tv_sharded, noise_floor)


def test_distribute_batch_rejects_unpadded_uneven(monkeypatch):
    """With a mocked 4-process world, an unpadded local batch (rows !=
    host_batch_rows(n)) must raise loudly instead of reaching
    make_array_from_process_local_data with divergent global shapes."""
    import jax

    from e3diff_tpu.parallel import multihost

    mesh = make_mesh(dp=8, tp=1)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    local = {k: np.asarray(v)[:16] for k, v in _batch(16).items()}
    with pytest.raises(ValueError, match="pad_local_batch"):
        multihost.distribute_batch(local, mesh, global_rows=67)

    # inconsistent per-key row counts are rejected too
    bad = dict(local)
    bad["ligand_angles"] = bad["ligand_angles"][:8]
    with pytest.raises(ValueError, match="inconsistent"):
        multihost.distribute_batch(bad, mesh)


def test_initialize_multihost_attempts_autodetect(monkeypatch):
    """With nothing configured, initialize IS attempted (TPU pods
    auto-detect from the environment — skipping it there would make
    --multihost a silent no-op); an undetectable environment downgrades
    to a single-process warning instead of crashing."""
    import warnings

    import jax

    from e3diff_tpu.parallel import initialize_multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    if hasattr(jax.distributed, "is_initialized"):
        monkeypatch.setattr(jax.distributed, "is_initialized",
                            lambda: False)
    pidx, pcount = initialize_multihost()
    assert calls == [{"coordinator_address": None, "num_processes": None,
                      "process_id": None}]
    assert (pidx, pcount) == (0, 1)

    # no cluster detectable -> warn + continue single-process
    def boom(**kw):
        raise RuntimeError("no cluster")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert initialize_multihost() == (0, 1)
    assert any("no cluster detected" in str(w.message) for w in caught)

    # explicitly-configured multi-process failures stay loud
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        initialize_multihost(coordinator_address="10.0.0.1:1",
                             num_processes=4, process_id=0)
    # ... including when ONLY process_id was configured (a run set up
    # with just JAX_PROCESS_ID must not silently train alone)
    with _pytest.raises(RuntimeError):
        initialize_multihost(process_id=3)
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    with _pytest.raises(RuntimeError):
        initialize_multihost()


def test_initialize_multihost_env_driven(monkeypatch):
    import jax

    from e3diff_tpu.parallel import initialize_multihost

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    if hasattr(jax.distributed, "is_initialized"):
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    initialize_multihost()
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]

    # already-initialized runtimes are left alone
    if hasattr(jax.distributed, "is_initialized"):
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
        calls.clear()
        initialize_multihost()
        assert calls == []


def test_dp_accum_train_step_matches_single_device():
    """accum_steps under a dp-sharded batch: the interleaved microbatch
    split keeps every microbatch spread over the dp axis, and the result
    equals the unsharded accum step (same rng)."""
    mesh = make_mesh(dp=4, tp=2)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(50)
    batch = _batch()

    rng = jax.random.PRNGKey(17)
    params = model.init(rng, jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    trainer = StructureTrainer(
        model, diff, make_optimizer(params, base_lr=1e-3,
                                    max_epochs=10, steps_per_epoch=5),
        accum_steps=2)

    state1 = trainer.create_state(rng, batch)
    state1 = state1.replace(params=jax.tree.map(jnp.copy, params))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, metrics1 = trainer.train_step(state1, dict(jbatch), rng)

    state2 = trainer.create_state(rng, batch)
    state2 = state2.replace(params=shard_params(params, mesh))
    sbatch = shard_batch(batch, mesh)
    state2, metrics2 = trainer.train_step(state2, sbatch, rng)

    np.testing.assert_allclose(float(metrics1["train_loss"]),
                               float(metrics2["train_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_tp_sharded_int8_sampling_matches_single_device():
    """int8_matmul packed params compose with the mesh: the path-based
    Megatron rules shard the int8 payload and its per-channel scales
    consistently (both split the output axis), so a (dp=4, tp=2)-sharded
    int8 sampler reproduces the single-device int8 samples."""
    from e3diff_tpu.sampling.structure import make_structure_sampler
    from e3diff_tpu.utils.quant import quantize_params_int8

    mesh = make_mesh(dp=4, tp=2)
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(1)
    batch = _batch(8)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8,), jnp.int32),
                        *[jnp.asarray(batch[k]) for k in
                          ["ligand_angles", "ligand_attn_mask", "receptor_seq",
                           "receptor_angles", "receptor_attn_mask"]])["params"]
    q = quantize_params_int8(params)
    sampler = make_structure_sampler(model, diff, return_trajectory=False)
    key = jax.random.PRNGKey(3)

    single, _ = sampler(q, jbatch, key)
    sharded, _ = sampler(shard_params(q, mesh),
                         shard_batch(batch, mesh), key)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-4)
