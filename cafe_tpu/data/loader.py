"""Async input pipeline: background batch preparation + device staging.

The reference leans on torch DataLoader worker processes
(load_data.py:425-443). Here batches are memmap slices (one memcpy each),
so a single background thread that slices + device_puts ahead of the train
loop keeps the chip fed; the queue depth of 2 double-buffers H2D transfers
behind compute.
"""

from __future__ import annotations

import collections
import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

_SENTINEL = object()


def device_prefetch(batch_iter: Iterator, depth: int = 8,
                    transfer_workers: int = 4) -> Iterator:
    """Wrap a (dense, sparse, label, valid) iterator; yields the same
    tuples with arrays already on the default device.

    Transfers run on a small thread pool with an ordered future queue:
    each device_put is dominated by round-trip latency (severely so on
    remote-tunnel runtimes), so overlapping several in flight — not just
    double-buffering one — is what keeps the step dispatch fed. Results
    are yielded strictly in input order."""

    def put(b):
        dense, sparse, label, valid = b
        dx = None if dense is None else jax.device_put(jnp.asarray(dense))
        return (dx, jax.device_put(jnp.asarray(sparse)),
                jax.device_put(jnp.asarray(label)), valid)

    ex = ThreadPoolExecutor(max_workers=transfer_workers)
    futs = collections.deque()
    it = iter(batch_iter)
    try:
        for b in itertools.islice(it, depth):
            futs.append(ex.submit(put, b))
        while futs:
            out = futs.popleft().result()
            nxt = next(it, _SENTINEL)
            if nxt is not _SENTINEL:
                futs.append(ex.submit(put, nxt))
            yield out
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
