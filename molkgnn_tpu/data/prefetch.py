"""Background batch prefetching (host packing + H2D overlap).

A producer thread assembles batches and stages them onto the device while
the main thread runs the train step — the framework's answer to the
reference's dataloader worker processes (data.py:165 ``num_workers``).
Queue depth 2 is enough: one batch in compute, one staged.

``to_device`` defaults to False: on tunneled-TPU environments (axon),
explicit jax.numpy staging from a background thread serializes against the
main thread's dispatch and is ~20x slower than letting jit transfer the
numpy arrays itself; the thread still overlaps host-side batch packing.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch_to_device(
    iterable: Iterable, size: int = 2, to_device: bool = False
) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []

    def producer():
        try:
            for item in iterable:
                if to_device:
                    item = jax.tree.map(jax.numpy.asarray, item)
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
