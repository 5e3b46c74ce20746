"""Host-side epoch loop: train/val epochs, metric means, checkpointing,
step-time profiling hooks.

Replaces the reference's Lightning Trainer usage
(structure_model/train_model.py:99-116): validation every epoch, a
single-best checkpoint on val_loss (Q4-faithful 'max' by default), the
final raw weights save, and per-epoch loss prints. Adds what the reference
lacks: full train-state resume, wall-clock step timing, and optional
jax.profiler traces.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from e3diff_tpu.data.prefetch import prefetch_to_device
from e3diff_tpu.training.checkpoint import BestTracker, CheckpointManager


def _mean_metrics(history: list[dict]) -> dict:
    """Epoch means with ONE device round trip per metric.

    float()-ing each step's scalars individually costs a ~25 ms tunnel
    round trip per (step, metric) — more than the train step itself at
    B=128. Stack on device, mean, transfer once per key."""
    if not history:
        return {}
    import jax.numpy as jnp

    out = {}
    for k in history[0].keys():
        vals = [h[k] for h in history]
        if isinstance(vals[0], jax.Array):
            out[k] = float(jnp.mean(jnp.stack(vals)))
        else:
            out[k] = float(np.mean([float(v) for v in vals]))
    return out


def _clean(batch: dict) -> dict:
    from e3diff_tpu.data.dataset import strip_meta

    return strip_meta(batch)


def _log_profile_summary(profile_dir: str, n_steps: int,
                         log_fn: Callable[[str], None]) -> None:
    """Print the per-op bucket/roofline digest of a just-stopped trace.

    Makes --profile_dir self-interpreting without tensorboard (which is
    absent here): the same utils/xplane.py decode the perf harness uses.
    Never lets a parse failure kill a training run."""
    try:
        from e3diff_tpu.utils.xplane import (
            bucketize, device_op_totals, roofline)

        totals = device_op_totals(profile_dir)
        if not totals:
            return
        buckets = bucketize(totals, steps=max(n_steps, 1))
        roof = roofline(totals, steps=max(n_steps, 1))
        log_fn(f"profile [{profile_dir}] device buckets (ms/step): "
               + ", ".join(f"{k}={v}" for k, v in buckets.items()))
        log_fn(f"profile roofline: {roof}")
    except Exception as e:  # diagnostics must not break training
        log_fn(f"profile summary unavailable: {type(e).__name__}: {e}")


def train_loop(
    trainer: Any,                    # StructureTrainer or SequenceTrainer
    state: Any,
    train_batches: Callable[[int], Iterable[dict]],  # epoch -> batches
    val_batches: Callable[[], Iterable[dict]] | None,
    rng,
    *,
    max_epochs: int,
    min_epochs: int = 0,       # accepted for reference CONFIG parity; the
                               # reference's Trainer(min_epochs=...) is
                               # equally inert without an early-stop
                               # callback (train_model.py:99-110), so
                               # every run trains exactly max_epochs
    ckpt_dir: str | None = None,
    ckpt_mode: str = "max",          # Q4-faithful default
    ckpt_every: int = 1,             # 'last' (resume) save cadence, epochs
    log_every: int = 30,
    log_fn: Callable[[str], None] = print,
    profile_dir: str | None = None,
    resume: bool = True,
    prefetch: int = 2,               # batches staged ahead on a background
                                     # thread (assembly + H2D overlap the
                                     # device step); 0 disables
) -> tuple[Any, list[dict]]:
    """Runs the full training schedule; returns (state, epoch_history)."""
    manager = best = None
    start_epoch = 0
    if ckpt_dir is not None:
        manager = CheckpointManager(ckpt_dir)
        best = BestTracker(manager, mode=ckpt_mode)
        if resume and manager.exists("last"):
            try:
                restored = manager.restore(
                    "last", {"state": state, "epoch": 0, "best": 0.0})
            except Exception:
                # pre-'best' checkpoint layout (older runs)
                restored = manager.restore(
                    "last", {"state": state, "epoch": 0})
            state, start_epoch = restored["state"], int(restored["epoch"]) + 1
            best_val = restored.get("best")
            if best_val is not None and np.isfinite(best_val):
                # without this, the first post-resume validation would
                # unconditionally overwrite best_val_model (tracker
                # restarts at None) even when it is strictly worse
                best.best = float(best_val)
            log_fn(f"resumed from epoch {start_epoch}")

    history = []
    # profile the second epoch of this run (skips the compile epoch) —
    # or the only epoch when just one will execute
    profile_epoch = (start_epoch + 1 if max_epochs - start_epoch > 1
                     else start_epoch)
    for epoch in range(start_epoch, max_epochs):
        if profile_dir is not None and epoch == profile_epoch:
            jax.profiler.start_trace(profile_dir)

        epoch_metrics = []
        t_epoch = time.perf_counter()
        t_first_done = None
        batches = train_batches(epoch)
        if prefetch:
            batches = prefetch_to_device(batches, size=prefetch)
        for i, batch in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            state, metrics = trainer.train_step(state, _clean(batch), step_rng)
            if i == 0:
                # surface compile time once (float() is a true host sync;
                # block_until_ready is unreliable through remote tunnels)
                float(metrics["train_loss"])
                t_first_done = time.perf_counter()
            epoch_metrics.append(metrics)
            if log_every and i % log_every == 0:
                log_fn(f"epoch {epoch} step {i}: "
                       f"loss={float(metrics['train_loss']):.4f}")

        if not epoch_metrics:
            raise ValueError(
                "train_batches yielded ZERO batches for epoch "
                f"{epoch} — the train split is smaller than batch_size "
                "under drop_last; training would silently save untrained "
                "weights. Lower --batch_size or enlarge the dataset.")
        # _mean_metrics pulls every metric to host => syncs all steps
        train_means = _mean_metrics(epoch_metrics)
        t_train_done = time.perf_counter()
        n_steps = len(epoch_metrics)
        if profile_dir is not None and epoch == profile_epoch:
            # stop BEFORE validation: the digest divides by the train
            # step count, so the trace must hold train steps only
            jax.profiler.stop_trace()
            _log_profile_summary(profile_dir, n_steps, log_fn)
        steps_per_sec = ((n_steps - 1) / max(t_train_done - t_first_done, 1e-9)
                         if n_steps > 1 and t_first_done else 0.0)
        log_fn(f"Training Loss:{train_means.get('train_loss', float('nan'))}")

        val_means = {}
        if val_batches is not None:
            val_metrics = []
            vbatches = val_batches()
            if prefetch:
                vbatches = prefetch_to_device(vbatches, size=prefetch)
            for batch in vbatches:
                rng, val_rng = jax.random.split(rng)
                val_metrics.append(
                    trainer.eval_step(state, _clean(batch), val_rng))
            val_means = _mean_metrics(val_metrics)
            log_fn(f"Validation Loss:{val_means.get('val_loss', float('nan'))}")

        record = {"epoch": epoch, **train_means, **val_means,
                  "steps_per_sec": steps_per_sec,
                  "epoch_seconds": time.perf_counter() - t_epoch}
        history.append(record)

        if manager is not None:
            # time spent BLOCKED on checkpointing (snapshot saves should
            # make this ~the device-copy time; a large value means the
            # backpressure bound engaged — raise ckpt_every)
            t_ckpt = time.perf_counter()
            if val_means and best is not None:
                # best slot holds params only — it's an inference artifact
                # loadable by every sample CLI (like 'final')
                best.update(val_means, {"params": state.params})
            if (epoch + 1) % max(ckpt_every, 1) == 0 \
                    or epoch == max_epochs - 1:
                manager.save("last", {
                    "state": state, "epoch": epoch,
                    "best": (float("nan") if best is None
                             or best.best is None else best.best)})
            record["ckpt_wait_seconds"] = time.perf_counter() - t_ckpt

    if manager is not None:
        manager.save_final(state.params)
        if getattr(state, "ema_params", None) is not None:
            # EMA weights as a second params-only inference artifact —
            # point any sampling CLI / the serving engine at
            # <ckpt_dir>/final_ema to sample from the averaged weights
            manager.save("final_ema", {"params": state.ema_params},
                         block=True)
        manager.close()
    return state, history
