"""Double-buffered host→device prefetch.

The reference overlaps host work with device work via torch DataLoader
workers (train.py dataloader_num_workers); the TPU-native equivalent is a
small pipeline: a background thread runs the host-side transform (decode /
preprocess / splice-plan build) and `jax.device_put`s up to `depth` batches
ahead, so image decoding rides under the previous batch's device step.

Used by the eval runner (prepare-ahead) and available for training input
pipelines. Exceptions in the worker propagate to the consumer at the batch
where they occurred; iteration order is preserved.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


class DevicePrefetcher:
    """Iterate `source`, applying `transform` (host-side) and optionally
    `jax.device_put` in a background thread, `depth` items ahead."""

    def __init__(
        self,
        source: Iterable,
        transform: Callable | None = None,
        depth: int = 2,
        to_device: bool = False,
        device=None,
    ):
        self._source = source
        self._transform = transform
        self._to_device = to_device
        self._device = device
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _worker(self):
        try:
            for item in self._source:
                if self._transform is not None:
                    item = self._transform(item)
                if self._to_device:
                    import jax

                    item = jax.device_put(item, self._device)
                self._q.put(("item", item))
        except BaseException as e:  # propagate to the consumer
            self._q.put(("error", e))
        else:
            self._q.put(("done", _SENTINEL))

    def __iter__(self) -> Iterator:
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            kind, payload = self._q.get()
            if kind == "item":
                yield payload
            elif kind == "error":
                raise payload
            else:
                return
