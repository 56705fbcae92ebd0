"""HotSketch: a device-resident bucketized Space-Saving sketch.

Functional JAX re-design of the reference's sequential C++ sketch
(ArtifactEvaluation/embeddings/sketch.cpp:9-151). Semantics preserved:

* `S` buckets x `C` cells; each cell holds (id, score, hot-slot).
* An id's score accumulates on every insert; crossing `threshold` promotes it
  to an exclusive hot-embedding slot drawn from a free pool (sketch.cpp:89-103).
* New ids take an empty cell; if the bucket is full, the min-score cell is
  evicted Space-Saving style — the newcomer *inherits* the victim's count
  (sketch.cpp:113-124) — unless that cell is protected by a hot slot.
* When total accumulated score exceeds S*threshold*10, all counters decay
  multiplicatively and hot ids falling below threshold are demoted, returning
  their slots to the pool (sketch.cpp:76-88, 135, 144).

What is re-designed for TPU (sequential -> batch-parallel, all under jit):

* The C++ processes ids one-by-one; here a batch is sorted + deduplicated
  (segment-summing duplicate scores) so matched-cell updates become
  conflict-free scatters.
* The std::queue free list becomes a device-side stack (`free`, `free_top`);
  batched promotions allocate slots by prefix-sum rank, demotions push slots
  back with a masked scatter.
* Placement of brand-new ids can conflict when two batch ids hash to the same
  bucket; a fixed number of resolution rounds (write -> read-back winner ->
  losers retry) reproduces the sequential fill order for up to
  `insert_rounds` colliders per bucket per step. Residual losers simply retry
  on a later batch — statistically negligible and bounded.
* In-bucket cells are NOT kept sorted by score (sketch.cpp:104-109 keeps them
  sorted so cell 3 is the min); the eviction victim is found with argmin
  instead, which is the same semantics without the data movement.

Determinism: given the same batch contents, the result is bit-identical
regardless of intra-batch ordering (sort-by-id canonicalizes processing
order), which is *stronger* than the reference (whose result depends on
occurrence order within the batch).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel for padded/invalid lanes; sorts to the end of any real id range.
INVALID_ID = np.int32(2**31 - 1)

_HASH_MULT = np.uint32(2654435761)  # Knuth multiplicative hash


class HotSketchConfig(NamedTuple):
    """Static configuration (hashable; closed over by jit)."""

    buckets: int          # S; == hot-slot limit `lim` in the reference
    threshold: float      # promotion threshold k
    decay: float = 0.99   # multiplicative decay rate
    cells: int = 4        # C cells per bucket
    insert_rounds: int = 2  # conflict-resolution rounds for new-id placement

    @property
    def hot_limit(self) -> int:
        # usable hot slots are 1..buckets-1 (0 means "not hot"), matching
        # sketch.cpp:38-39 where ids 1..lim-1 seed the queue.
        return self.buckets


class HotSketchState(NamedTuple):
    """Device-array sketch state; a checkpointable pytree."""

    val: jnp.ndarray       # int32 [S, C] stored ids (valid where cnt > 0)
    cnt: jnp.ndarray       # float32 [S, C] accumulated importance
    dic: jnp.ndarray       # int32 [S, C] hot slot (0 = cold)
    free: jnp.ndarray      # int32 [S] stack of free hot slots
    free_top: jnp.ndarray  # int32 [] number of valid entries in `free`
    tot: jnp.ndarray       # float32 [] score mass since last decay


def _pad_rows(n: int) -> int:
    """Pad device arrays to a shardable row multiple (see base.ROW_ALIGN);
    bucket indexing always uses the logical size `cfg.buckets`."""
    from ..embeddings.base import round_up
    return round_up(n)


def init_sketch(cfg: HotSketchConfig) -> HotSketchState:
    s, c = cfg.buckets, cfg.cells
    sp = _pad_rows(s)
    free = np.zeros(sp, dtype=np.int32)
    free[: s - 1] = np.arange(1, s, dtype=np.int32)
    return HotSketchState(
        val=jnp.zeros((sp, c), dtype=jnp.int32),
        cnt=jnp.zeros((sp, c), dtype=jnp.float32),
        dic=jnp.zeros((sp, c), dtype=jnp.int32),
        free=jnp.asarray(free),
        free_top=jnp.asarray(s - 1, dtype=jnp.int32),
        tot=jnp.asarray(0.0, dtype=jnp.float32),
    )


def _bucket_of(cfg: HotSketchConfig, ids: jnp.ndarray) -> jnp.ndarray:
    h = ids.astype(jnp.uint32) * _HASH_MULT
    return (h % jnp.uint32(cfg.buckets)).astype(jnp.int32)


def query_cells(cfg: HotSketchConfig, val: jnp.ndarray, cnt: jnp.ndarray,
                dic: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Query against raw cell arrays (shard-local slices use this inside
    shard_map where no full HotSketchState exists)."""
    h = _bucket_of(cfg, ids)
    bv = val[h]                          # [B, C]
    bc = cnt[h]
    bd = dic[h]
    m = (bc > 0) & (bv == ids[:, None]) & (bd != 0)
    slot = jnp.max(jnp.where(m, bd, 0), axis=1)
    return jnp.where(slot > 0, -slot, ids)


def sketch_query(cfg: HotSketchConfig, state: HotSketchState,
                 ids: jnp.ndarray) -> jnp.ndarray:
    """For each id return -hot_slot if hot else the id itself
    (sketch.cpp:45-53's convention: negative means hot)."""
    return query_cells(cfg, state.val, state.cnt, state.dic, ids)


def alloc_slots(free, free_top, want_mask):
    """Pop a free hot slot per True lane of want_mask (by prefix-sum rank).
    Returns (slot, got, new_free_top). Shared by both sketch generations."""
    rank = jnp.cumsum(want_mask.astype(jnp.int32))
    idx = free_top - rank
    got = want_mask & (idx >= 0)
    slot = jnp.where(got, free[jnp.clip(idx, 0, free.shape[0] - 1)], 0)
    return slot, got, free_top - got.sum(dtype=jnp.int32)


def push_slots(free, free_top, slots, mask):
    """Push slots[mask] onto the free stack via masked scatter."""
    pos = free_top + jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = jnp.where(mask, pos, free.shape[0])  # OOB -> dropped
    free = free.at[pos].set(slots, mode="drop")
    return free, free_top + mask.sum(dtype=jnp.int32)


def _decay(cfg: HotSketchConfig, state: HotSketchState) -> HotSketchState:
    """Multiplicative decay + demotion of hot ids dropping below threshold
    (sketch.cpp:76-88)."""
    demote = (state.dic != 0) & (state.cnt * cfg.decay < cfg.threshold)
    dflat = demote.reshape(-1)
    dic_flat = state.dic.reshape(-1)
    free, free_top = push_slots(state.free, state.free_top, dic_flat, dflat)
    return state._replace(
        cnt=state.cnt * cfg.decay,
        dic=jnp.where(demote, 0, state.dic),
        free=free,
        free_top=free_top,
        tot=jnp.zeros_like(state.tot),
    )


class InsertResult(NamedTuple):
    """Newly promoted ids, laid out in the insert's internal order.

    `slots[i]` is valid only where `mask[i]`; (`ids[i]`, `slots[i]`) pairs
    drive hot-row migration (weight_high[slot] <- weight_hash[id % hash]).

    Lane count is implementation-defined: the v1 sketch returns the
    flattened [B*cells] candidate grid (promotion sweeps every touched
    bucket cell), the CAFE+ sketch returns [B]. Consumers must treat the
    arrays as (ids, slots, mask) triples of matching length, nothing more.
    """

    ids: jnp.ndarray   # int32 [L]
    slots: jnp.ndarray  # int32 [L]
    mask: jnp.ndarray  # bool  [L]


@functools.partial(jax.jit, static_argnums=0)
def sketch_insert(cfg: HotSketchConfig, state: HotSketchState,
                  ids: jnp.ndarray, scores: jnp.ndarray,
                  ) -> Tuple[HotSketchState, InsertResult]:
    """Batched insert of (id, importance) pairs — SORTLESS design.

    Padded lanes must carry id == INVALID_ID (their scores are ignored).
    Equivalent to the reference's batch_insert_val loop (sketch.cpp:142-150);
    intra-batch duplicates combine through scatter-adds instead of an
    explicit sort+segment-sum (an earlier design sorted the batch; the sort
    was ~4x the cost of everything else on TPU).

    Per round:
      * matched lanes scatter-ADD their scores into their cell — XLA
        combines duplicate (bucket, cell) indices natively;
      * one deterministic representative per bucket (the smallest pending
        id, chosen by a min-claim scatter) performs new-id placement /
        Space-Saving eviction, so writers never conflict; duplicate lanes
        of the winning id add their scores to the freshly placed cell;
      * losers retry next round (they usually match what round 1 placed).

    Promotion then runs as a sweep over the batch's *touched buckets*: any
    occupied cell with cnt >= threshold, no slot, and not freshly placed
    this call (reference semantics: brand-new ids never promote on the
    insert that placed them, sketch.cpp:113-118) gets a slot from the free
    stack by prefix-sum rank.
    """
    b = ids.shape[0]
    s, c = cfg.buckets, cfg.cells
    sp = state.val.shape[0]  # physical (padded) rows; used as drop index
    k = jnp.float32(cfg.threshold)

    valid = ids != INVALID_ID
    scores = jnp.where(valid, scores, 0.0)

    # occasional global decay (sketch.cpp:135: tot > s*k*10)
    state = jax.lax.cond(
        state.tot > jnp.float32(s) * k * 10.0,
        lambda st: _decay(cfg, st),
        lambda st: st,
        state,
    )

    h = _bucket_of(cfg, ids)
    lanes = jnp.arange(b)

    val, cnt, dic = state.val, state.cnt, state.dic
    free, free_top = state.free, state.free_top
    fresh = jnp.zeros((sp, c), bool)   # cells written by THIS call
    pending = valid

    for _ in range(cfg.insert_rounds):
        bv = val[h]            # [B, C]
        bc = cnt[h]
        occ = bc > 0.0
        m = occ & (bv == ids[:, None])
        is_matched = m.any(axis=1) & pending
        cell_m = jnp.argmax(m, axis=1)

        # matched: scatter-add accumulates, duplicates combine for free
        cnt = cnt.at[jnp.where(is_matched, h, sp), cell_m].add(
            jnp.where(is_matched, scores, 0.0), mode="drop")

        # unmatched: deterministic winner id per bucket via min-claim
        un = pending & ~is_matched
        claim_id = jnp.full((sp,), INVALID_ID, jnp.int32).at[
            jnp.where(un, h, sp)].min(ids, mode="drop")
        winner = un & (claim_id[h] == ids)
        claim_lane = jnp.full((sp,), b, jnp.int32).at[
            jnp.where(winner, h, sp)].min(lanes.astype(jnp.int32),
                                          mode="drop")
        rep = winner & (claim_lane[h] == lanes)

        has_empty = (~occ).any(axis=1)
        cell_e = jnp.argmax(~occ, axis=1)
        cell_v = jnp.argmin(bc, axis=1)
        bd_v = dic[h, cell_v]
        use_cell = jnp.where(has_empty, cell_e, cell_v)
        can_write = has_empty | (bd_v == 0)

        place_rep = rep & can_write
        hw = jnp.where(place_rep, h, sp)
        val = val.at[hw, use_cell].set(ids, mode="drop")
        # empty cell starts from zero; eviction inherits the victim's count
        cnt = cnt.at[jnp.where(place_rep & has_empty, h, sp),
                     use_cell].set(0.0, mode="drop")
        fresh = fresh.at[hw, use_cell].set(True, mode="drop")
        # all duplicate lanes of the winning id contribute their scores
        add_w = winner & can_write
        cnt = cnt.at[jnp.where(add_w, h, sp), use_cell].add(
            jnp.where(add_w, scores, 0.0), mode="drop")

        done = is_matched | add_w | (rep & ~can_write)
        pending = pending & ~done

    # ---- promotion sweep over touched buckets --------------------------
    claim2 = jnp.full((sp,), b, jnp.int32).at[
        jnp.where(valid, h, sp)].min(lanes.astype(jnp.int32), mode="drop")
    rep2 = valid & (claim2[h] == lanes)
    tc = cnt[h]                      # [B, C] post-update
    td = dic[h]
    tv = val[h]
    tf = fresh[h]
    cand = rep2[:, None] & (tc > 0.0) & (tc >= k) & (td == 0) & ~tf
    cand_f = cand.reshape(-1)
    slot, can, free_top = alloc_slots(free, free_top, cand_f)
    hb = jnp.repeat(h, c)
    cell_idx = jnp.tile(jnp.arange(c), b)
    dic = dic.at[jnp.where(can, hb, sp), cell_idx].set(slot, mode="drop")

    new_state = HotSketchState(
        val=val, cnt=cnt, dic=dic, free=free, free_top=free_top,
        tot=state.tot + scores.sum(),
    )
    res = InsertResult(
        ids=jnp.where(can, tv.reshape(-1), INVALID_ID),
        slots=slot, mask=can)
    return new_state, res


def revert_promotions(cfg: HotSketchConfig, state: HotSketchState,
                      ids: jnp.ndarray, promo: InsertResult,
                      excess: jnp.ndarray) -> HotSketchState:
    """Undo the promotions on `excess` lanes of an InsertResult: clear the
    cell's slot and push it back on the free stack. Lossless — the id
    keeps its count above threshold and re-promotes on its next touch.
    Used by the sharded step to bound the per-step migration exchange.

    `ids` must be the id array the insert ran on (promo lanes are its
    [B*cells] candidate grid)."""
    b = ids.shape[0]
    c = cfg.cells
    sp = state.val.shape[0]
    h = _bucket_of(cfg, ids)
    hb = jnp.repeat(h, c)
    cell_idx = jnp.tile(jnp.arange(c), b)
    dic = state.dic.at[jnp.where(excess, hb, sp), cell_idx].set(
        0, mode="drop")
    free, free_top = push_slots(state.free, state.free_top, promo.slots,
                                excess)
    return state._replace(dic=dic, free=free, free_top=free_top)


def rebuild_free_list(cfg: HotSketchConfig,
                      state: HotSketchState) -> HotSketchState:
    """Rebuild the free stack by scanning slot occupancy — the reference's
    post-checkpoint-load `update()` (sketch.cpp:61-75).

    Preserves the padded free-array shape (ROW_ALIGN invariant): padding
    lanes sort to the end and free_top never reaches them."""
    s = cfg.buckets
    sp = state.free.shape[0]
    used = jnp.zeros(sp, bool).at[state.dic.reshape(-1)].set(
        True, mode="drop")
    idx = jnp.arange(sp)
    is_slot = (idx >= 1) & (idx < s)  # slot 0 = cold sentinel; >=s = padding
    free_mask = is_slot & ~used
    order = jnp.argsort(~free_mask, stable=True)  # free slot indices first
    n_free = free_mask.sum(dtype=jnp.int32)
    return state._replace(free=order.astype(jnp.int32), free_top=n_free)


def hot_fraction(cfg: HotSketchConfig, state: HotSketchState) -> jnp.ndarray:
    """Fraction of the buckets-1 usable hot slots currently allocated
    (diagnostic; counts via the free stack, not the padded dic array)."""
    capacity = max(cfg.buckets - 1, 1)
    return (capacity - state.free_top) / capacity


def analyse(cfg: HotSketchConfig, state: HotSketchState,
            ids: jnp.ndarray) -> jnp.ndarray:
    """Fraction of `ids` currently HOT (holding a slot) — the reference's
    in-training recall probe `analyse` (tricks/sketch.cpp:314-320): feed
    it the offline ideal top-k ids and the result is sketch recall."""
    return jnp.mean(sketch_query(cfg, state, ids) < 0)


def analyse_tracked(cfg: HotSketchConfig, state: HotSketchState,
                    ids: jnp.ndarray) -> jnp.ndarray:
    """Fraction of `ids` present in the sketch at all (hot or cold cell) —
    the reference's `analyse1` (tricks/sketch.cpp:321-327)."""
    h = _bucket_of(cfg, ids)
    m = (state.cnt[h] > 0) & (state.val[h] == ids[:, None])
    return jnp.mean(m.any(axis=1))
