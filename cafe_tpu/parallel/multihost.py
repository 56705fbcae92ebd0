"""Per-process input feeding + host-side gathering for multi-host runs.

Every process iterates the SAME logical batch stream (the datasets are
identical files / identically-seeded generators on every host) but only
materializes and uploads ITS rows: process p contributes rows
[p*B/np, (p+1)*B/np) of each global batch via
jax.make_array_from_process_local_data, which places them on the
process's local devices — exactly the slice the 'data'-axis sharding
assigns there (jax.devices() orders by process). No cross-host data
movement happens at input time.

Reference: none — the reference is single-GPU (SURVEY.md §2.6); this is
the TPU-pod input path BASELINE.md's north star requires.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def global_batches(mesh, batch_iter: Iterator, depth: int = 4,
                   local: bool = False) -> Iterator:
    """Wrap a (dense, sparse, label, valid) iterator into globally-sharded
    jax.Arrays, each process uploading only its row slice. Uploads
    overlap the train loop via a small thread pool (same motivation as
    data.loader.device_prefetch).

    local=False: the iterator yields GLOBAL batches (every process built
    the full batch; its slice is cut here) — eval path / small runs.
    local=True: the iterator already yields THIS process's rows
    (data.process_batch_iterator) — per-process I/O, the pod-scale path."""
    import collections
    import itertools
    from concurrent.futures import ThreadPoolExecutor

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    nproc = jax.process_count()
    pid = jax.process_index()
    ax = tuple(mesh.axis_names)
    sh2 = NamedSharding(mesh, P(ax, None))
    sh1 = NamedSharding(mesh, P(ax))

    def put(batch):
        dense, sparse, label, valid = batch
        if local:
            lo, hi = 0, sparse.shape[0]
        else:
            rows = sparse.shape[0]
            if rows % nproc:
                raise ValueError(f"global batch {rows} must divide by "
                                 f"{nproc} processes")
            lo = pid * (rows // nproc)
            hi = lo + rows // nproc
        mk = jax.make_array_from_process_local_data
        dn = None if dense is None else mk(sh2, np.ascontiguousarray(
            dense[lo:hi]))
        sp = mk(sh2, np.ascontiguousarray(sparse[lo:hi]))
        lb = mk(sh1, np.ascontiguousarray(label[lo:hi]))
        return dn, sp, lb, valid

    ex = ThreadPoolExecutor(max_workers=2)
    futs = collections.deque()
    it = iter(batch_iter)
    try:
        for b in itertools.islice(it, depth):
            futs.append(ex.submit(put, b))
        while futs:
            out = futs.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                futs.append(ex.submit(put, nxt))
            yield out
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def gather_to_host(x) -> np.ndarray:
    """Materialize a (possibly non-fully-addressable) global array on
    every host — eval scores under multi-host."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
