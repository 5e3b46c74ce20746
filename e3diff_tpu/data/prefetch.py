"""Host-side input prefetch: stage upcoming batches' assembly and H2D
transfer while the device computes the current step.

The reference keeps its input pipeline in DataLoader worker processes
(structure_model/train_model.py:52-57 — 16 workers whose main job is the
per-item noising that this framework moved INTO the jitted step). What
remains host-side here is cheap numpy batch assembly
(data/dataset.py::batches) plus the host->device transfer — which is not
cheap through a slow link (this environment's remote-TPU tunnel moves
5-13 MB/s; a B=64 structure batch is ~0.6 MB, i.e. potentially longer
than the 95.9 ms train step itself). jax.device_put dispatches
asynchronously, so ONE background thread that assembles and stages a few
batches ahead hides both costs behind the device's step time.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import numpy as np

_SENTINEL = object()


def prefetch_to_device(iterator: Iterable[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Yield batches from `iterator` with meta-stripping, assembly, and
    device_put performed up to `size` batches ahead on a background
    thread.

    Values already on device (e.g. pre-sharded by parallel.shard_batch)
    pass through untouched; numpy values are device_put (optionally with
    `sharding`). Meta keys (structure_ids, num_valid) are stripped — they
    never enter jit. Exceptions raised by the source iterator re-raise at
    the consumer's next pull. Abandoning the generator early (an
    exception in the training loop, or an explicit close()) stops the
    producer promptly — it polls a stop event while blocked — so no
    thread, staged device batches, or source iterator leak per abandoned
    epoch.
    """
    from e3diff_tpu.data.dataset import strip_meta

    q: queue.Queue = queue.Queue(maxsize=max(1, int(size)))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                pass
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                staged = {
                    k: (v if isinstance(v, jax.Array)
                        else jax.device_put(np.asarray(v), sharding))
                    for k, v in strip_meta(batch).items()}
                if not _put(staged):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # re-raised by the consumer
            _put(e)

    threading.Thread(target=producer, name="input-prefetch",
                     daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
