"""Explicit SPMD embedding exchange — pedagogical/demo module.

SUPERSEDED for production use by parallel/exchange.py (round 2), which
integrates this pattern — plus dedup, Adagrad, and the shard-local
sketch — into the real train step with HLO-verified traffic. This module
remains as the minimal, single-table illustration of the exchange and is
exercised by tests/test_sharding.py::TestExplicitExchange.

The pjit path (parallel/sharding.py) lets the XLA SPMD partitioner derive
collectives from sharding annotations — always correct, occasionally
conservative. This module is the hand-written exchange for the embedding
hot path, the pattern large-scale DLRM systems use:

  tables row-sharded over the mesh; per step
    1. all_gather the (deduplicated, small int32) lookup ids over ICI,
    2. every device gathers the rows it owns, zeros elsewhere,
    3. reduce_scatter(+) returns each device exactly its batch shard's rows
       — total traffic M*D*(n-1)/n per device, the all-to-all optimum up to
       a small constant (rows that cross shards must move either way).

  updates are the mirror image: all_gather (ids, grads) would double
  traffic, so instead each device receives the full grad set via
  all_gather and applies only the rows it owns with a masked scatter-add —
  owner-compute, no write conflicts, no reduce needed.

Used by tests to prove numerical equivalence with the single-device path
on the virtual CPU mesh; on a pod slice these ride ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs)


def sharded_gather(mesh: Mesh, table: jnp.ndarray,
                   ids: jnp.ndarray) -> jnp.ndarray:
    """Row-sharded table [N, D] x batch-sharded ids [M] -> rows [M, D]
    (batch-sharded). N and M must divide by the mesh size."""

    def f(tbl, ids_local):
        all_ids = jax.lax.all_gather(ids_local, "data", tiled=True)  # [M]
        shard_rows = tbl.shape[0]
        lo = jax.lax.axis_index("data") * shard_rows
        local = all_ids - lo
        mine = (local >= 0) & (local < shard_rows)
        rows = tbl[jnp.clip(local, 0, shard_rows - 1)]
        rows = jnp.where(mine[:, None], rows, 0.0)
        # each device keeps its own batch slice of the summed result
        return jax.lax.psum_scatter(rows, "data", scatter_dimension=0,
                                    tiled=True)

    return shard_map(f, mesh, in_specs=(P("data", None), P("data")),
                     out_specs=P("data"))(table, ids)


def sharded_scatter_add(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                        updates: jnp.ndarray) -> jnp.ndarray:
    """Owner-compute scatter-add: table row-sharded, (ids, updates)
    batch-sharded; every device applies the full update set to the rows it
    owns. Duplicate ids combine exactly like the single-device path."""

    def f(tbl, ids_local, upd_local):
        all_ids = jax.lax.all_gather(ids_local, "data", tiled=True)
        all_upd = jax.lax.all_gather(upd_local, "data", tiled=True)
        shard_rows = tbl.shape[0]
        lo = jax.lax.axis_index("data") * shard_rows
        local = all_ids - lo
        mine = (local >= 0) & (local < shard_rows)
        idx = jnp.where(mine, local, shard_rows)
        return tbl.at[idx].add(all_upd, mode="drop")

    return shard_map(f, mesh,
                     in_specs=(P("data", None), P("data"), P("data")),
                     out_specs=P("data", None))(table, ids, updates)


_composite_cache: dict = {}


def sharded_embedding_lookup_and_update(mesh: Mesh, table, ids, grads_fn,
                                        lr: float):
    """Demonstration composite: lookup -> caller computes row grads from
    the returned rows -> owner-compute SGD apply. Returns (rows, new_table)
    through one jitted region. The jitted closure is memoized per
    (mesh, grads_fn, lr) — a fresh @jax.jit per call would recompile
    every invocation. The cache entry holds strong references to the mesh
    and grads_fn so their id()s cannot be recycled onto a stale closure."""
    key = (id(mesh), id(grads_fn), lr)
    entry = _composite_cache.get(key)
    if entry is not None and entry[0] is mesh and entry[1] is grads_fn:
        run = entry[2]
    else:
        @jax.jit
        def run(tbl, ids_):
            rows = sharded_gather(mesh, tbl, ids_)
            g = grads_fn(rows)
            return rows, sharded_scatter_add(mesh, tbl, ids_, -lr * g)

        _composite_cache[key] = (mesh, grads_fn, run)
    return run(table, ids)
