"""Sharding annotations for the train state and batches.

The idiomatic JAX recipe: annotate shardings on jit boundaries and let the
XLA SPMD partitioner insert the collectives (all-gathers for sharded-table
row lookups, reduce-scatters for scatter updates, psums for data-parallel
dense grads). Row-sharded leaves:

  * every embedding table / optimizer accumulator  [rows, dim] -> P('data', None)
  * sketch bucket arrays val/cnt/dic               [S, C]      -> P('data', None)
  * AdaEmbed's id->slot map and importance array   [N]         -> P('data')

Dense tower params are replicated; batches are sharded along the batch axis.
A later explicit shard_map path (parallel/embedding_parallel.py) replaces
the auto-partitioned lookup with dedup + all-to-all for bandwidth-optimal
exchange; this module is the always-correct baseline.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# state-leaf names that hold per-row embedding data; optimizer slots
# (adagrad _acc, adam _m/_v) shard exactly like their table
_ROW_TABLES = {"table", "hash", "high", "q", "r", "hot", "cold", "weight"}
_ROW_SHARDED_2D = {t + sfx for t in _ROW_TABLES
                   for sfx in ("", "_acc", "_m", "_v")}
_ROW_SHARDED_1D = {"dic", "grad_norm", "hot_dict"}
# sketch bucket arrays: v1 (val/cnt; dic handled by name) and the CAFE+
# two-tier state (main tier val1/cnt1/dic1, staging val2/cnt2/dic2/ts2)
_SKETCH_2D = {"val", "cnt", "val1", "cnt1", "dic1",
              "val2", "cnt2", "dic2", "ts2"}

_MIN_ROWS = 512  # everything is ROW_ALIGN(512)-padded; smaller = scalarish


def _leaf_name(path) -> str:
    for entry in reversed(path):
        if hasattr(entry, "key"):
            return str(entry.key)
        if hasattr(entry, "name"):
            return str(entry.name)
    return ""


def state_shardings(state: Any, mesh: Mesh, shard_embeddings: bool) -> Any:
    """Pytree of NamedShardings matching `state` (a TrainState)."""
    axes = tuple(mesh.axis_names)   # ("data",) or ("dcn", "ici")
    repl = NamedSharding(mesh, P())
    row2d = NamedSharding(mesh, P(axes, None))
    row1d = NamedSharding(mesh, P(axes))

    n = int(mesh.devices.size)

    def embed_leaf(path, leaf):
        if not shard_embeddings:
            return repl
        name = _leaf_name(path)
        # shard-local sketch bookkeeping: free_top/tot (and the CAFE+
        # adaptive scalars) carry one scalar per shard ([n]) under the
        # explicit exchange; the single-device layout keeps them 0-d
        if name in ("free_top", "tot", "threshold", "real_n",
                    "decay_acc", "step") and leaf.ndim == 1 \
                and leaf.shape[0] == n:
            return row1d
        if leaf.shape and leaf.shape[0] % n:
            return repl  # not evenly shardable over this mesh
        # sketch state always shards when divisible (the explicit
        # exchange's shard_map specs expect it regardless of size)
        if leaf.ndim == 2 and name in _SKETCH_2D and leaf.shape[0] >= n:
            return row2d
        if leaf.ndim == 1 and name == "free" and leaf.shape[0] >= n:
            return row1d
        if leaf.ndim == 2 and leaf.shape[0] >= _MIN_ROWS and (
                name in _ROW_SHARDED_2D or name == "dic"):
            return row2d
        if leaf.ndim == 1 and leaf.shape[0] >= _MIN_ROWS and \
                name in _ROW_SHARDED_1D:
            return row1d
        return repl

    embed_sh = jax.tree_util.tree_map_with_path(embed_leaf, state.embed)
    return type(state)(
        params=jax.tree.map(lambda _: repl, state.params),
        embed=embed_sh,
        embed_dense=jax.tree.map(lambda _: repl, state.embed_dense),
        opt=jax.tree.map(lambda _: repl, state.opt),
        step=repl,
    )


def batch_shardings(mesh: Mesh):
    """(dense, ids, labels, valid) shardings: batch-dim parallel."""
    data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    repl = NamedSharding(mesh, P())
    return data, data, data, repl


def shard_train_step(train_step, mesh: Mesh, state: Any,
                     shard_embeddings: bool, donate: bool = False):
    """Re-jit a built train step with explicit in/out shardings and place
    `state` accordingly. Returns (sharded_step, placed_state).

    `donate` re-applies state-buffer donation (the original jit's
    donate_argnums is lost when re-jitting the unwrapped function).

    NOTE: device_put ALIASES leaves whose sharding already matches
    (replicated scalars/dense params on a fresh state), so placed_state
    may share buffers with `state`. Callers that keep stepping the
    ORIGINAL state through a donating step (A/B tests) must hand this
    function a copy (jax.tree.map(jnp.copy, state))."""
    st_sh = state_shardings(state, mesh, shard_embeddings)
    dense_sh, ids_sh, lab_sh, val_sh = batch_shardings(mesh)
    placed = jax.device_put(state, st_sh)
    fn = jax.jit(
        train_step.__wrapped__ if hasattr(train_step, "__wrapped__")
        else train_step,
        in_shardings=(st_sh, dense_sh, ids_sh, lab_sh, val_sh),
        out_shardings=(st_sh, None),
        donate_argnums=(0,) if donate else (),
    )
    return fn, placed
