"""Bounded identity-keyed cache for jitted sampler closures.

jit caches are per-function-object: without caching, every
make_*_sampler call builds a fresh closure and repays a full recompile
(30-340 s through this environment's remote-TPU tunnel) even for
identical (model, diffusion, flags). The compiled closure strongly
references its model/diffusion (closure cells), so entries cannot be
weakref-evicted while cached; instead the cache is a small LRU — sweeps
that construct many models recycle the oldest executable instead of
growing without bound.
"""

from __future__ import annotations

import threading
from collections import OrderedDict


class JitSamplerCache:
    """LRU keyed by (id(obj)..., static flags...). Identity keys are
    revalidated with `is` on lookup, so a recycled id never aliases."""

    def __init__(self, maxsize: int = 8):
        self.maxsize = maxsize
        self._lock = threading.Lock()
        self._entries: OrderedDict = OrderedDict()

    def get(self, key, *pinned):
        """Returns the cached value if key matches AND every pinned object
        is identical to the one stored with it."""
        with self._lock:
            hit = self._entries.get(key)
            if hit is None:
                return None
            stored_pinned, value = hit
            if len(stored_pinned) != len(pinned) or any(
                    a is not b for a, b in zip(stored_pinned, pinned)):
                return None
            self._entries.move_to_end(key)
            return value

    def put(self, key, value, *pinned):
        with self._lock:
            self._entries[key] = (pinned, value)
            self._entries.move_to_end(key)
            while len(self._entries) > self.maxsize:
                self._entries.popitem(last=False)
