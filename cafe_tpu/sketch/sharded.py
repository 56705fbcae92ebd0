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


def local_view(st: HotSketchState) -> HotSketchState:
    """Inside shard_map: squeeze the per-shard scalar lanes back to the
    scalar shapes the v1 kernel expects (free_top/tot arrive as [1])."""
    return st._replace(free_top=st.free_top[0], tot=st.tot[0])


def global_view(st: HotSketchState) -> HotSketchState:
    """Inverse of local_view for shard_map outputs."""
    return st._replace(free_top=st.free_top[None], tot=st.tot[None])
