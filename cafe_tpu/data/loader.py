"""Async input pipeline: background batch preparation + device staging.

The reference leans on torch DataLoader worker processes
(load_data.py:425-443). Here batches are memmap slices (one memcpy each),
so a single background thread that slices + device_puts ahead of the train
loop keeps the chip fed; the queue depth of 2 double-buffers H2D transfers
behind compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

_SENTINEL = object()


def device_prefetch(batch_iter: Iterator, depth: int = 2) -> Iterator:
    """Wrap a (dense, sparse, label, valid) iterator; yields the same
    tuples with arrays already on the default device."""

    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for dense, sparse, label, valid in batch_iter:
                dx = None if dense is None else jax.device_put(
                    jnp.asarray(dense))
                q.put((dx, jax.device_put(jnp.asarray(sparse)),
                       jax.device_put(jnp.asarray(label)), valid))
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    if err:
        raise err[0]
