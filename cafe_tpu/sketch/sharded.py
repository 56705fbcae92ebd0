"""Shard-local HotSketch layout for the explicit SPMD embedding path.

SURVEY.md §7 ("Multi-host sketch semantics") requires per-shard
thresholds/free lists with promotion decisions that stay device-local —
no global sequential slot allocation in the sharded step. The reference
has no distributed sketch at all (its C++ sketch is one host object,
ArtifactEvaluation/embeddings/sketch.cpp); this is new design.

Layout: ids route to shards by a multiplicative hash `shard_of(id) % n`
(decorrelated from the in-shard bucket hash). Each shard owns a contiguous
slice of every sketch array and runs the UNCHANGED v1 kernel
(hotsketch.sketch_insert / sketch_query) on its local slice with a local
config of `S_l = padded_hotn / n` buckets — per-shard Space-Saving with
its own free stack and decay clock. A shard's local hot slot `l` maps to
the global hot row `shard * S_l + l`; local slot 0 stays the cold
sentinel, so global capacity is n*(S_l - 1) slots, all inside the
already-allocated [0, padded_hotn) hot region of the unified table.

State shape vs the single-device sketch: `free_top` and `tot` become
length-n arrays (one scalar per shard) so they shard with
PartitionSpec('data'); everything else keeps its [rows, cells] shape and
row-shards evenly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .hotsketch import HotSketchConfig, HotSketchState

_SHARD_MULT = np.uint32(0x9E3779B1)  # golden-ratio hash, != bucket hash mult


def shard_of(ids: jnp.ndarray, n: int) -> jnp.ndarray:
    """Owning shard of each id (decorrelated from the bucket hash)."""
    return ((ids.astype(jnp.uint32) * _SHARD_MULT) % jnp.uint32(n)).astype(
        jnp.int32)


def local_config(cfg: HotSketchConfig, n: int) -> Tuple[HotSketchConfig, int]:
    """(per-shard config, S_l). Total padded rows must divide by n."""
    from ..embeddings.base import round_up
    total = round_up(cfg.buckets)
    if total % n:
        raise ValueError(f"padded sketch rows {total} not divisible by "
                         f"mesh size {n}")
    s_l = total // n
    return cfg._replace(buckets=s_l), s_l


def init_sharded_sketch(cfg: HotSketchConfig, n: int) -> HotSketchState:
    """Global state whose per-shard slices are independent local sketches.

    free[s*S_l : (s+1)*S_l] holds shard s's LOCAL slot stack (values are
    local slots 1..S_l-1); free_top/tot are [n]."""
    lcfg, s_l = local_config(cfg, n)
    c = cfg.cells
    free = np.zeros((n, s_l), dtype=np.int32)
    free[:, : s_l - 1] = np.arange(1, s_l, dtype=np.int32)[None, :]
    return HotSketchState(
        val=jnp.zeros((n * s_l, c), dtype=jnp.int32),
        cnt=jnp.zeros((n * s_l, c), dtype=jnp.float32),
        dic=jnp.zeros((n * s_l, c), dtype=jnp.int32),
        free=jnp.asarray(free.reshape(-1)),
        free_top=jnp.full((n,), s_l - 1, dtype=jnp.int32),
        tot=jnp.zeros((n,), dtype=jnp.float32),
    )


def local_config_plus(cfg, n: int):
    """(per-shard CafePlusConfig, S_l)."""
    from ..embeddings.base import round_up
    total = round_up(cfg.lim)
    if total % n:
        raise ValueError(f"padded lim {total} not divisible by {n}")
    s_l = total // n
    return cfg._replace(lim=s_l), s_l


def init_sharded_sketch_plus(cfg, n: int):
    """Sharded CAFE+ state: each shard's slice is an independent local
    two-tier sketch with its OWN adaptive threshold, decay clock, and
    free list (per-shard thresholds are the SURVEY §7 requirement).
    Local arrays are exact-size (no ROW_ALIGN padding needed — the
    n-stacked global array is evenly shardable by construction)."""
    import jax.numpy as jnp
    from .hotsketch_plus import CafePlusState

    lcfg, s_l = local_config_plus(cfg, n)
    c = cfg.cells
    n1, n2 = lcfg.n1, lcfg.n2
    free = np.zeros((n, s_l), dtype=np.int32)
    free[:, : s_l - 1] = np.arange(1, s_l, dtype=np.int32)[None, :]
    z = lambda rows, d: jnp.zeros((n * rows, c), dtype=d)  # noqa: E731
    return CafePlusState(
        val1=z(n1, jnp.int32), cnt1=z(n1, jnp.float32),
        dic1=z(n1, jnp.int32),
        val2=z(n2, jnp.int32), cnt2=z(n2, jnp.float32),
        dic2=z(n2, jnp.int32), ts2=z(n2, jnp.int32),
        free=jnp.asarray(free.reshape(-1)),
        free_top=jnp.full((n,), s_l - 1, jnp.int32),
        threshold=jnp.full((n,), cfg.threshold, jnp.float32),
        real_n=jnp.zeros((n,), jnp.int32),
        decay_acc=jnp.ones((n,), jnp.float32),
        step=jnp.zeros((n,), jnp.int32),
    )


def query_sharded_plus(cfg, n: int, st, ids: jnp.ndarray) -> jnp.ndarray:
    """Single-process query against the sharded CAFE+ layout (serving /
    parity tests); returns the global -slot convention."""
    from .hotsketch_plus import _h1, _h2

    lcfg, s_l = local_config_plus(cfg, n)
    shard = shard_of(ids, n)
    h1 = _h1(lcfg, ids) + shard * lcfg.n1
    m1 = (st.cnt1[h1] > 0) & (st.val1[h1] == ids[:, None]) & \
        (st.dic1[h1] != 0)
    s1 = jnp.max(jnp.where(m1, st.dic1[h1], 0), axis=1)
    h2 = _h2(lcfg, ids) + shard * lcfg.n2
    m2 = (st.cnt2[h2] > 0) & (st.val2[h2] == ids[:, None]) & \
        (st.dic2[h2] != 0)
    s2 = jnp.max(jnp.where(m2, st.dic2[h2], 0), axis=1)
    slot_local = jnp.maximum(s1, s2)
    slot = jnp.where(slot_local > 0, slot_local + shard * s_l, 0)
    return jnp.where(slot > 0, -slot, ids)


def sketch_partition_specs(state, axis: str = "data"):
    """Pytree of PartitionSpecs for a SHARDED sketch state: 2-D cell
    arrays row-shard, 1-D lanes (free stacks, per-shard scalars) shard
    on their only axis."""
    import jax
    from jax.sharding import PartitionSpec as P
    return jax.tree.map(
        lambda l: P(axis, None) if l.ndim == 2 else P(axis), state)


def shard_local_view(state):
    """Inside shard_map: squeeze per-shard scalar lanes ([1] locally)
    back to the scalars the kernels expect; cell/free arrays pass
    through."""
    import jax
    return jax.tree.map(
        lambda x: x[0] if (x.ndim == 1 and x.shape[0] == 1) else x, state)


def shard_global_view(state):
    """Inverse of shard_local_view for shard_map outputs."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(
        lambda x: x[None] if x.ndim == 0 else x, state)


def query_sharded(cfg: HotSketchConfig, n: int, st: HotSketchState,
                  ids: jnp.ndarray) -> jnp.ndarray:
    """Single-process query against the SHARDED layout (serving a
    sharded-trained checkpoint on one chip, parity tests): route each id
    to its shard, probe that shard's bucket slice, return the GLOBAL slot
    convention (-slot if hot else id)."""
    lcfg, s_l = local_config(cfg, n)
    shard = shard_of(ids, n)
    from .hotsketch import _bucket_of
    h = _bucket_of(lcfg, ids) + shard * s_l     # global bucket row
    bv, bc, bd = st.val[h], st.cnt[h], st.dic[h]
    m = (bc > 0) & (bv == ids[:, None]) & (bd != 0)
    slot_local = jnp.max(jnp.where(m, bd, 0), axis=1)
    slot = jnp.where(slot_local > 0, slot_local + shard * s_l, 0)
    return jnp.where(slot > 0, -slot, ids)


