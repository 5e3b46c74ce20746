"""Orbax checkpointing: params + optimizer state + step, with resume.

The reference's checkpointing is Lightning ModelCheckpoint(save_top_k=1,
monitor='val_loss', mode='max') — quirk Q4: mode='max' keeps the WORST
validation epoch, and the actually-used weights are the separate final
state_dict save (structure_model/train_model.py:77-83,150). Here:

* ``save``/``restore`` persist the full train state (params, opt state,
  step), enabling true mid-training resume (the reference has none);
* ``BestTracker`` reproduces the monitor-based single-best slot, with
  ``mode`` defaulting to the reference-faithful "max";
* ``save_final`` mirrors the reference's final raw weights save.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, force: bool = True,
             block: bool = False):
        """Asynchronous by default: orbax's StandardCheckpointer commits
        the host->storage write in background threads (it waits for any
        previous in-flight save itself). NOTE the device->host transfer
        runs in save()'s BLOCKING section (measured: an 81 s stall for
        512 MB through this environment's remote-TPU tunnel), so on
        slow-interconnect hosts the real save-cost lever is the
        `ckpt_every` cadence, not the async commit; on local hosts
        (PCIe D2H) the backgrounded disk write is the dominant part and
        overlap is genuine."""
        self._ckptr.save(self._path(name), state, force=force)
        if block:
            self._ckptr.wait_until_finished()

    def restore(self, name: str, abstract_state: Any):
        return self._ckptr.restore(self._path(name), abstract_state)

    def exists(self, name: str) -> bool:
        # orbax waits internally on save/restore/close but not here: an
        # in-flight save lands in a .tmp dir, so probe after it commits
        self._ckptr.wait_until_finished()
        return os.path.isdir(self._path(name))

    def save_final(self, params: Any):
        """The reference's end-of-training raw weights save (blocking —
        it's the last thing a run does)."""
        self.save("final", {"params": params}, block=True)

    def close(self):
        self._ckptr.close()  # waits for in-flight commits itself


class BestTracker:
    """Single-best-checkpoint slot on a monitored metric.

    mode='max' is the reference-faithful default (Q4 — it keeps the worst
    val_loss); pass mode='min' for the sane behavior."""

    def __init__(self, manager: CheckpointManager, monitor: str = "val_loss",
                 mode: str = "max", name: str = "best_val_model"):
        assert mode in ("max", "min")
        self.manager = manager
        self.monitor = monitor
        self.mode = mode
        self.name = name
        self.best: float | None = None

    def update(self, metrics: dict, state: Any) -> bool:
        value = float(metrics[self.monitor])
        better = (self.best is None or
                  (value > self.best if self.mode == "max" else value < self.best))
        if better:
            self.best = value
            self.manager.save(self.name, state)
        return better
