"""Input-prefetch pipeline: staged batches must be bit-identical to the
direct path, strip meta, pass device arrays through, and propagate
source errors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e3diff_tpu.data import prefetch_to_device


def _batches(n=5):
    for i in range(n):
        yield {
            "x": np.full((4, 3), float(i), np.float32),
            "mask": np.ones((4,), np.float32),
            "num_valid": np.int32(4),
            "structure_ids": [f"id{i}"],
        }


def test_prefetch_matches_direct_iteration():
    staged = list(prefetch_to_device(_batches(), size=2))
    direct = list(_batches())
    assert len(staged) == len(direct)
    for s, d in zip(staged, direct):
        assert set(s) == {"x", "mask"}   # meta stripped
        assert isinstance(s["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(s["x"]), d["x"])
        np.testing.assert_array_equal(np.asarray(s["mask"]), d["mask"])


def test_prefetch_passes_device_arrays_through():
    pre_staged = {"x": jnp.arange(4.0)}
    out = list(prefetch_to_device(iter([pre_staged]), size=1))
    assert out[0]["x"] is pre_staged["x"]   # no copy, no re-put


def test_prefetch_propagates_source_errors():
    def bad():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("corrupt shard")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="corrupt shard"):
        list(it)


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_train_loop_prefetch_is_bit_identical(tmp_path):
    """prefetch=2 must not change training: same rng stream, same
    batches, same losses as prefetch=0."""
    from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser, TransformerConfig
    from e3diff_tpu.training import StructureTrainer, make_optimizer
    from e3diff_tpu.training.loop import train_loop

    cfg = lambda cross: TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=1, intermediate_size=64,
        max_position_embeddings=16, dropout=0.0, attention_dropout=0.0,
        add_cross_attention=cross)
    ds = LigandBindingSiteData(
        synthetic_complexes(n=8, seed=5, receptor_len_range=(8, 12),
                            ligand_len_range=(5, 8)),
        None, max_len=16, pocket_ext=1)

    def run(prefetch):
        model = StructureDenoiser(cfg(False), cfg(True))
        trainer = StructureTrainer(
            model, GaussianAngleDiffusion.cosine(20),
            make_optimizer(None, base_lr=1e-3, max_epochs=2,
                           steps_per_epoch=2))
        state = trainer.create_state(
            jax.random.PRNGKey(0), next(ds.batches(4)))
        _, history = train_loop(
            trainer, state,
            lambda e: ds.batches(4, shuffle=True, seed=e),
            lambda: ds.batches(4),
            jax.random.PRNGKey(1), max_epochs=2, ckpt_dir=None,
            log_every=0, prefetch=prefetch)
        return [(h["train_loss"], h["val_loss"]) for h in history]

    assert run(0) == run(2)


def test_prefetch_abandoned_generator_stops_producer():
    """Dropping the generator mid-iteration stops the producer thread
    (no per-epoch thread/batch leak)."""
    import threading
    import time

    produced = []

    def slow_source():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), float(i), np.float32)}

    it = prefetch_to_device(slow_source(), size=1)
    next(it)
    it.close()   # abandon early
    time.sleep(0.5)
    n_after_close = len(produced)
    time.sleep(0.5)
    assert len(produced) == n_after_close   # producer stopped
    assert n_after_close < 100
    assert not any(t.name == "input-prefetch" and t.is_alive()
                   for t in threading.enumerate())
