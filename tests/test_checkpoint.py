"""Checkpoint save/restore, best-tracking (Q4), and train-loop resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
from e3diff_tpu.diffusion import GaussianAngleDiffusion
from e3diff_tpu.models import StructureDenoiser, TransformerConfig
from e3diff_tpu.training import StructureTrainer, make_optimizer
from e3diff_tpu.training.checkpoint import BestTracker, CheckpointManager
from e3diff_tpu.training.loop import train_loop

MAXLEN = 16


def _cfg(cross):
    return TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=1, intermediate_size=64,
        max_position_embeddings=MAXLEN, dropout=0.0, attention_dropout=0.0,
        add_cross_attention=cross)


def _setup():
    ds = LigandBindingSiteData(
        synthetic_complexes(n=8, seed=5, receptor_len_range=(8, 12),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1)
    batch = {k: v for k, v in next(ds.batches(8)).items()
             if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_cfg(False), _cfg(True))
    diff = GaussianAngleDiffusion.cosine(20)
    trainer = StructureTrainer(
        model, diff, make_optimizer(None, base_lr=1e-3,
                                    max_epochs=4, steps_per_epoch=1))
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    return ds, batch, trainer, state


def test_save_restore_roundtrip(tmp_path):
    _, batch, trainer, state = _setup()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state2, _ = trainer.train_step(
        state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1))
    mgr.save("last", {"state": state2, "epoch": 3})
    assert mgr.exists("last")

    _, _, trainer3, fresh = _setup()
    restored = mgr.restore("last", {"state": fresh, "epoch": 0})
    assert int(restored["epoch"]) == 3
    for a, b in zip(jax.tree.leaves(restored["state"].params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["state"].step) == int(state2.step)
    mgr.close()


def test_best_tracker_q4_mode_max(tmp_path):
    """mode='max' keeps the HIGHEST val_loss (reference quirk Q4)."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    bt = BestTracker(mgr, mode="max")
    assert bt.update({"val_loss": 1.0}, {"x": jnp.zeros(2)})
    assert not bt.update({"val_loss": 0.5}, {"x": jnp.ones(2)})
    assert bt.update({"val_loss": 2.0}, {"x": jnp.full((2,), 2.0)})
    restored = mgr.restore("best_val_model", {"x": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(restored["x"]), 2.0)
    mgr.close()


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_train_loop_resume(tmp_path):
    ds, batch, trainer, state = _setup()
    ckpt_dir = str(tmp_path / "run")

    def train_batches(epoch):
        yield batch

    def val_batches():
        yield batch

    rng = jax.random.PRNGKey(7)
    state1, hist1 = train_loop(trainer, state, train_batches, val_batches,
                               rng, max_epochs=2, ckpt_dir=ckpt_dir,
                               log_fn=lambda *_: None)
    assert len(hist1) == 2

    # fresh state, resume: should skip to epoch 2 and run epochs 2..3
    _, _, trainer2, fresh = _setup()
    state2, hist2 = train_loop(trainer2, fresh, train_batches, val_batches,
                               rng, max_epochs=4, ckpt_dir=ckpt_dir,
                               log_fn=lambda *_: None)
    assert [h["epoch"] for h in hist2] == [2, 3]
    assert int(state2.step) == 4


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_ema_final_ema_saved_and_resumable(tmp_path):
    """ema_decay runs save a final_ema params artifact, keep the EMA copy
    inside the resumable 'last' state, and resume seamlessly."""
    import os

    ds, batch, trainer, _ = _setup()
    trainer = StructureTrainer(trainer.model, trainer.diffusion,
                               trainer.optimizer, ema_decay=0.9)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    ckpt_dir = str(tmp_path / "run")

    def batches(_epoch=None):
        yield batch

    state1, _ = train_loop(trainer, state, batches, batches,
                           jax.random.PRNGKey(7), max_epochs=2,
                           ckpt_dir=ckpt_dir, log_fn=lambda *_: None)
    assert state1.ema_params is not None
    assert os.path.isdir(os.path.join(ckpt_dir, "final_ema"))

    # final_ema is a params-only artifact loadable like 'final'
    mgr = CheckpointManager(ckpt_dir)
    abstract = jax.eval_shape(lambda: state1.params)
    ema = mgr.restore("final_ema", {"params": abstract})["params"]
    np.testing.assert_allclose(
        np.asarray(ema["angles_predictor"]["dense1"]["kernel"]),
        np.asarray(state1.ema_params["angles_predictor"]["dense1"]["kernel"]),
        rtol=1e-6)
    # EMA lags the online params after training
    assert np.abs(
        np.asarray(ema["angles_predictor"]["dense1"]["kernel"])
        - np.asarray(state1.params["angles_predictor"]["dense1"]["kernel"])
    ).max() > 0

    # resume: fresh EMA state restores the saved tree (incl. ema branch)
    fresh = trainer.create_state(jax.random.PRNGKey(0), batch)
    state2, hist2 = train_loop(trainer, fresh, batches, batches,
                               jax.random.PRNGKey(7), max_epochs=4,
                               ckpt_dir=ckpt_dir, log_fn=lambda *_: None)
    assert [h["epoch"] for h in hist2] == [2, 3]
    assert state2.ema_params is not None


class _ScriptedTrainer:
    """train_step is identity; eval_step returns a scripted val_loss."""

    def __init__(self, vals):
        self.vals = list(vals)

    def train_step(self, state, batch, rng):
        return state, {"train_loss": jnp.float32(0.0)}

    def eval_step(self, state, batch, rng):
        return {"val_loss": jnp.float32(self.vals.pop(0))}


def _dummy_state():
    import optax
    from e3diff_tpu.training.structure import TrainState

    return TrainState.create(apply_fn=lambda *a, **k: None,
                             params={"w": jnp.zeros((2,))},
                             tx=optax.sgd(0.1))


def test_best_tracker_value_survives_resume(tmp_path):
    """The tracked best metric is persisted in 'last': a resumed run must
    NOT overwrite best_val_model with a worse first validation."""
    import os
    import time as _time

    ckpt_dir = str(tmp_path / "run")
    batches = lambda *_: iter([{"x": np.zeros(1)}])  # noqa: E731
    rng = jax.random.PRNGKey(0)

    train_loop(_ScriptedTrainer([0.5, 0.3]), _dummy_state(), batches,
               batches, rng, max_epochs=2, ckpt_dir=ckpt_dir,
               ckpt_mode="min", log_fn=lambda *_: None)
    best_dir = os.path.join(ckpt_dir, "best_val_model")
    mtime1 = os.path.getmtime(best_dir)
    _time.sleep(0.05)

    # resume with a WORSE validation (0.45 > 0.3): must not re-save best
    train_loop(_ScriptedTrainer([0.45]), _dummy_state(), batches,
               batches, rng, max_epochs=3, ckpt_dir=ckpt_dir,
               ckpt_mode="min", log_fn=lambda *_: None)
    assert os.path.getmtime(best_dir) == mtime1

    # and a better one still wins
    _time.sleep(0.05)
    train_loop(_ScriptedTrainer([0.2]), _dummy_state(), batches,
               batches, rng, max_epochs=4, ckpt_dir=ckpt_dir,
               ckpt_mode="min", log_fn=lambda *_: None)
    assert os.path.getmtime(best_dir) > mtime1


def test_zero_batch_epoch_fails_loudly(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="ZERO batches"):
        train_loop(_ScriptedTrainer([]), _dummy_state(),
                   lambda *_: iter([]), None, jax.random.PRNGKey(0),
                   max_epochs=1, ckpt_dir=str(tmp_path / "r"),
                   log_fn=lambda *_: None)


def test_snapshot_save_isolates_later_mutation(tmp_path):
    """The snapshot path copies arrays ON DEVICE before save() returns:
    what lands on disk is the state at save time, even when training
    donates/overwrites the buffers immediately afterwards."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr._snapshot_applicable()
    x = jnp.arange(8, dtype=jnp.float32)
    tree = {"state": {"x": x}, "epoch": 2}
    mgr.save("last", tree)
    # overwrite the source array while the background pull may be running
    tree["state"]["x"] = x + 100.0
    del x
    assert mgr.exists("last")   # joins the worker + orbax commit
    restored = mgr.restore(
        "last", {"state": {"x": jnp.zeros(8, jnp.float32)}, "epoch": 0})
    np.testing.assert_array_equal(np.asarray(restored["state"]["x"]),
                                  np.arange(8, dtype=np.float32))
    assert int(restored["epoch"]) == 2
    mgr.close()


def test_snapshot_saves_queue_in_order(tmp_path):
    """Back-to-back saves (best_val_model + 'last' in one epoch) drain on
    one worker; the last write to a slot wins."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    for i in range(3):
        mgr.save("last", {"v": jnp.full((4,), float(i)), "epoch": i})
        mgr.save("best", {"v": jnp.full((4,), float(10 + i))})
    assert mgr.exists("last") and mgr.exists("best")
    r = mgr.restore("last", {"v": jnp.zeros(4), "epoch": 0})
    np.testing.assert_array_equal(np.asarray(r["v"]), np.full(4, 2.0))
    assert int(r["epoch"]) == 2
    r = mgr.restore("best", {"v": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(r["v"]), np.full(4, 12.0))
    mgr.close()


def test_snapshot_save_error_surfaces(tmp_path):
    """A failure in the background pull/save raises on the next blocking
    call instead of vanishing."""
    import pytest

    mgr = CheckpointManager(str(tmp_path / "ckpt"))

    class Boom(Exception):
        pass

    def bad_save(*a, **k):
        raise Boom("disk on fire")

    mgr._ckptr.save = bad_save
    mgr.save("last", {"v": jnp.zeros(4)})
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        mgr.wait_until_finished()
    mgr._ckptr = __import__("orbax.checkpoint", fromlist=["x"]).StandardCheckpointer()
    mgr.close()


def test_snapshot_disabled_env(tmp_path, monkeypatch):
    """E3DIFF_SNAPSHOT_SAVES=0 falls back to the direct orbax path."""
    monkeypatch.setenv("E3DIFF_SNAPSHOT_SAVES", "0")
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert not mgr._snapshot_applicable()
    mgr.save("last", {"v": jnp.ones(4)})
    assert mgr._worker is None   # nothing queued
    assert mgr.exists("last")
    mgr.close()


def test_snapshot_failure_does_not_poison_final_save(tmp_path):
    """A transient background failure must not block later saves: the
    end-of-run final write succeeds, and close() raises with the first
    cause afterwards."""
    import pytest

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    real_save = mgr._ckptr.save
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("disk full (transient)")
        return real_save(*a, **k)

    mgr._ckptr.save = flaky
    mgr.save("last", {"v": jnp.zeros(4)})          # background: fails
    mgr.save_final({"w": jnp.ones(4)})             # must still land
    assert (tmp_path / "ckpt" / "final").is_dir()
    with pytest.raises(RuntimeError, match="1 background checkpoint"):
        mgr.close()


def test_snapshot_backpressure_bounds_live_copies(tmp_path):
    """At most two snapshots are alive; a third save blocks until the
    worker frees a slot (no unbounded device-copy queue)."""
    import threading as th
    import time as _t

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    gate = th.Event()
    real_save = mgr._ckptr.save

    def slow_save(*a, **k):
        gate.wait(5.0)
        return real_save(*a, **k)

    mgr._ckptr.save = slow_save
    t0 = _t.perf_counter()
    mgr.save("a", {"v": jnp.zeros(4)})   # slot 1 (draining, blocked on gate)
    mgr.save("b", {"v": jnp.zeros(4)})   # slot 2 (queued)
    assert _t.perf_counter() - t0 < 2.0  # neither blocked the caller
    blocked = {"t": None}

    def third():
        t1 = _t.perf_counter()
        mgr.save("c", {"v": jnp.zeros(4)})
        blocked["t"] = _t.perf_counter() - t1

    th3 = th.Thread(target=third)
    th3.start()
    _t.sleep(0.5)
    assert th3.is_alive()                # backpressure engaged
    gate.set()
    th3.join(10.0)
    assert not th3.is_alive()
    assert mgr.exists("a") and mgr.exists("b") and mgr.exists("c")
    mgr.close()


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_cross_topology_resume(tmp_path):
    """A checkpoint saved from a dp x tp sharded state restores onto a
    single-device template (and back onto a mesh) with identical values —
    the elastic-resume path a pod preemption -> single-host debug -> pod
    restart workflow needs."""
    from e3diff_tpu.parallel import make_mesh, shard_batch, shard_params

    _, batch, trainer, state = _setup()
    mesh = make_mesh(dp=4, tp=2)
    state = state.replace(params=shard_params(state.params, mesh))
    state, _ = trainer.train_step(state, shard_batch(batch, mesh),
                                  jax.random.PRNGKey(1))
    want = jax.tree.map(np.asarray, state.params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save("last", {"state": state, "epoch": 0})
    assert mgr.exists("last")

    # restore onto an UNSHARDED template (fresh single-device state)
    _, _, _, fresh = _setup()
    restored = mgr.restore("last", {"state": fresh, "epoch": 0})
    got = jax.tree.map(np.asarray, restored["state"].params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want)):
        assert pa == pb
        np.testing.assert_array_equal(a, b, err_msg=str(pa))

    # and back onto a DIFFERENT mesh shape (dp=8)
    mesh2 = make_mesh(dp=8, tp=1)
    _, _, _, fresh2 = _setup()
    fresh2 = fresh2.replace(params=shard_params(fresh2.params, mesh2))
    restored2 = mgr.restore("last", {"state": fresh2, "epoch": 0})
    got2 = jax.tree.map(np.asarray, restored2["state"].params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got2),
            jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    # the restored arrays actually carry the new mesh's shardings
    leaf = jax.tree.leaves(restored2["state"].params)[0]
    assert dict(leaf.sharding.mesh.shape) == {"dp": 8, "tp": 1}
    mgr.close()


def test_restore_abstract_tree_without_saved_sharding_file(tmp_path):
    """Sampling CLIs restore with a jax.eval_shape abstract tree (no
    shardings). CheckpointManager must pin a concrete default-device
    sharding itself rather than fall back to the checkpoint's _sharding
    FILE — that file names the SAVING platform's devices, so a
    TPU-trained checkpoint would refuse to restore on a CPU-only host
    ("sharding ... should be specified, concrete ... Got None").
    Deleting the _sharding file simulates the cross-platform case."""
    import os

    _, _, _, state = _setup()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_final(state.params)
    mgr.wait_until_finished()
    shard_file = tmp_path / "ckpt" / "final" / "_sharding"
    assert shard_file.exists()
    os.unlink(shard_file)

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.params)
    restored = mgr.restore("final", {"params": abstract})["params"]
    for a, b in zip(jax.tree.leaves(restored),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
