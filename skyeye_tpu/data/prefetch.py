"""Device prefetcher: overlap host batch assembly with device compute.

Host work (decode, augment, padding, layout) runs on a background thread; the
device_put itself happens on the CONSUMER thread because transfers are async in JAX
(dispatch returns immediately) and some PJRT backends — including this environment's
TPU relay — are not thread-safe for concurrent device_put + execute.

Images travel as uint8 (4x less than float32); normalization happens inside the
jitted train step (train/trainer.py handles uint8 inputs).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    transform: Optional[Callable] = None) -> Iterator:
    """Yield device-resident batches with host assembly running `size` items ahead.

    transform(batch) -> host pytree (numpy) built on the background thread.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                if transform is not None:
                    batch = transform(batch)
                q.put(batch)
        except Exception as e:  # surface loader errors on the consumer side
            err.append(e)
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            if err:
                raise err[0]
            return
        # async transfer on the consumer thread; overlaps with in-flight compute
        yield jax.tree_util.tree_map(jax.device_put, item)
