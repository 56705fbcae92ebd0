"""Production SPMD embedding exchange (shard_map + explicit collectives).

This is the bandwidth-optimal sharded lookup/update the SURVEY demands
(SURVEY.md §2.6/§7): tables row-sharded over the mesh, batches sharded
over the same axis, and per step only O(batch) bytes on the wire:

  forward   all_gather the flattened int32 row ids (M·4 bytes) ->
            owner-compute gather (each device reads the rows it owns,
            zeros elsewhere) -> psum_scatter returns each device exactly
            its batch shard's rows: M·D·4·(n-1)/n per device, the
            all-to-all optimum up to a small constant.
  backward  duplicate row ids are combined locally (dedup: sort +
            segment-sum, the coalesce kernel) -> all_gather (ids, grads)
            -> owner-compute sparse SGD/Adagrad apply. No reduction
            needed: every row has exactly one owner.

The table itself NEVER moves. tests/test_sharding.py compiles the full
sharded train step and asserts the HLO contains no table-sized
collective.

Byte-accounting note (honest): with XLA's static shapes, dedup cannot
shrink the exchange buffers themselves (they are sized for the full
batch); what it buys is conflict-free scatters (no serialized duplicate
combining on the owner) and one sort instead of k. The wire bytes are
O(batch·dim) either way — which is the design target; the failure mode
this module exists to rule out is the auto-partitioner's legal fallback
of all-gathering the O(vocab·dim) table.

The reference has no distributed execution (dlrm_s_pytorch.py:1441-1449
is a comment); requirements come from BASELINE.md's north star.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.sparse import apply_rows, coalesce
from .embedding_parallel import shard_map

AXIS = "data"

# sentinel row index far above any real table; survives the owner's
# `- lo` shift still out of range, so scatters drop these lanes
DROP_ROW = 2**30


def _owner_rows(tbl: jnp.ndarray, all_idx: jnp.ndarray) -> jnp.ndarray:
    """Rows of `tbl` (this device's shard) for global row ids `all_idx`;
    zeros for rows owned elsewhere."""
    rows_l = tbl.shape[0]
    lo = jax.lax.axis_index(AXIS) * rows_l
    loc = all_idx - lo
    mine = (loc >= 0) & (loc < rows_l)
    vals = tbl[jnp.clip(loc, 0, rows_l - 1)]
    return jnp.where(mine[:, None], vals, 0)


def _local_idx(rows_l: int, all_idx: jnp.ndarray) -> jnp.ndarray:
    """Global row ids -> local indices, out-of-shard lanes -> rows_l
    (the scatter drop index)."""
    lo = jax.lax.axis_index(AXIS) * rows_l
    loc = all_idx - lo
    return jnp.where((loc >= 0) & (loc < rows_l), loc, rows_l)


def owner_lookup_1d(arr_l: jnp.ndarray, all_idx: jnp.ndarray) -> jnp.ndarray:
    """Range-sharded 1-D array lookup inside shard_map: each device
    answers the lanes whose global index falls in its shard; since every
    lane has exactly one owner, a psum of the masked answers publishes
    the exact values (works for any payload incl. negatives)."""
    rows_l = arr_l.shape[0]
    lo = jax.lax.axis_index(AXIS) * rows_l
    loc = all_idx - lo
    mine = (loc >= 0) & (loc < rows_l)
    vals = arr_l[jnp.clip(loc, 0, rows_l - 1)]
    return jax.lax.psum(jnp.where(mine, vals, 0), AXIS)


def sharded_fetch(mesh: Mesh, table: jnp.ndarray,
                  idx: jnp.ndarray) -> jnp.ndarray:
    """Row-sharded table [R, D] x batch-sharded global rows [B, F]
    -> [B, F, D] batch-sharded."""

    def f(tbl, idx_l):
        b, fld = idx_l.shape
        all_idx = jax.lax.all_gather(idx_l.reshape(-1), AXIS, tiled=True)
        rows = _owner_rows(tbl, all_idx)
        out = jax.lax.psum_scatter(rows, AXIS, scatter_dimension=0,
                                   tiled=True)
        return out.reshape(b, fld, -1)

    return shard_map(f, mesh, in_specs=(P(AXIS, None), P(AXIS, None)),
                     out_specs=P(AXIS, None, None))(table, idx)


def slot_specs(slots):
    """PartitionSpecs for an optimizer-slot dict: row-shaped slots (adagrad
    acc, adam m/v) shard with the table; scalars (adam's t) replicate."""
    return jax.tree.map(
        lambda leaf: P(AXIS, None) if getattr(leaf, "ndim", 0) == 2
        else P(), slots)


def sharded_apply(mesh: Mesh, table: jnp.ndarray, slots, idx: jnp.ndarray,
                  grad: jnp.ndarray, lr, optimizer: str):
    """Owner-compute sparse update: (idx [B,F] global rows, grad [B,F,D])
    batch-sharded; duplicate ids dedup locally before the exchange.
    `slots` is the optimizer-slot dict from ops.sparse.init_slots
    ({} sgd / {acc} adagrad / {m,v,t} adam); row slots shard with the
    table. Returns (table, slots)."""

    def f(tbl, sl, idx_l, g_l):
        m = idx_l.size
        flat = idx_l.reshape(m)
        g = g_l.reshape(m, -1)
        # local dedup: one lane per distinct row, summed grads
        flat, g = coalesce(flat, g, drop_sentinel=int(DROP_ROW))
        all_idx = jax.lax.all_gather(flat, AXIS, tiled=True)
        all_g = jax.lax.all_gather(g, AXIS, tiled=True)
        loc = _local_idx(tbl.shape[0], all_idx)
        return apply_rows(tbl, sl, loc, all_g, lr, optimizer)

    specs = slot_specs(slots)
    return shard_map(
        f, mesh,
        in_specs=(P(AXIS, None), specs, P(AXIS, None),
                  P(AXIS, None, None)),
        out_specs=(P(AXIS, None), specs),
    )(table, slots, idx, grad)
