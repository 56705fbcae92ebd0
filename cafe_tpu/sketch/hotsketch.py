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
    # implementation of the insert's B-lane landing reduction
    # (ops/sorted_update.land_max; A/B'd on chip, tools/ab_insert_land.py;
    # 'auto' = the pallas kernel on TPU at <= 32k buckets, O(touched)
    # scatters above that (use_scatter_landing), segmax elsewhere —
    # all bit-identical by construction and by test/on-chip check)
    land_impl: str = "auto"
    # exclusive upper bound on inserted ids, when known (CafePart passes
    # the total offset-id space). Ids below 2^27 let the landing pack
    # (cell, id) into ONE channel — C+1 landing channels instead of 2C;
    # the serial segment reduction is linear in channels (docs/PERF.md)
    max_id: int = 2**31

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


def _pack_cells(val: jnp.ndarray, cnt: jnp.ndarray,
                dic: jnp.ndarray) -> jnp.ndarray:
    """[R, 3C] int32 view (val | cnt bits | dic) for ONE wide-row gather.
    TPU profile (tools/profile_lines.py): a B-lane gather of 16-byte rows
    costs ~80 us while 48-byte rows gather at ~20 us — the per-ROW cost
    dominates, so three narrow gathers are ~4x the one packed gather. The
    pack itself is a [R, 3C] elementwise pass (~2 us). cnt >= 0 always,
    so its f32 bit pattern is order-isomorphic and sign-safe as int32."""
    return jnp.concatenate(
        [val, jax.lax.bitcast_convert_type(cnt, jnp.int32), dic], axis=1)


def query_cells(cfg: HotSketchConfig, val: jnp.ndarray, cnt: jnp.ndarray,
                dic: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Query against raw cell arrays (shard-local slices use this inside
    shard_map where no full HotSketchState exists)."""
    return query_cells_packed(cfg, _pack_cells(val, cnt, dic), ids)


def query_cells_packed(cfg: HotSketchConfig, packed: jnp.ndarray,
                       ids: jnp.ndarray) -> jnp.ndarray:
    """Query against a PRE-PACKED [R, 3C] cell view. Serving paths pack
    once at model-freeze time (the [S, 3C] pack is an O(S) pass —
    ~440 us per call at CriteoTB sizes — pointless to repeat when the
    sketch is frozen; training shares the insert's pack via CSE)."""
    c = packed.shape[1] // 3
    h = _bucket_of(cfg, ids)
    prow = packed[h]                       # [B, 3C] one wide-row gather
    bv = prow[:, :c]
    bcbits = prow[:, c:2 * c]              # cnt > 0 <=> bits > 0 (cnt >= 0)
    bd = prow[:, 2 * c:]
    m = (bcbits > 0) & (bv == ids[:, None]) & (bd != 0)
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

    Lane count is implementation-defined: the v1 sketch returns a COMPACT
    [<=PROMO_LANES] list (candidates are prefix-compacted before slot
    allocation), the CAFE+ sketch returns [B]. Consumers must treat the
    arrays as (ids, slots, mask) triples of matching length, nothing more.
    `bucket`/`cell` locate each promoted cell so reverts don't have to
    re-derive the insert's internal layout (None for sketches that revert
    by re-hashing, e.g. CAFE+).
    """

    ids: jnp.ndarray   # int32 [L]
    slots: jnp.ndarray  # int32 [L]
    mask: jnp.ndarray  # bool  [L]
    bucket: jnp.ndarray = None  # int32 [L] bucket row of the promoted cell
    cell: jnp.ndarray = None    # int32 [L] cell index of the promoted cell


# Fixed lane budget for compacted promotion lists (and round-2 retries).
# Promotions per batch are bounded by threshold crossings — far below this
# in practice; overflow candidates simply promote on a later batch
# (lossless: their counts stay above threshold).
PROMO_LANES = 4096


def _prev(x: jnp.ndarray, fill) -> jnp.ndarray:
    """x shifted one lane right (x[i-1]), first lane = fill."""
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


@functools.partial(jax.jit, static_argnums=0)
def sketch_insert(cfg: HotSketchConfig, state: HotSketchState,
                  ids: jnp.ndarray, scores: jnp.ndarray,
                  ) -> Tuple[HotSketchState, InsertResult]:
    """Batched insert of (id, importance) pairs — SORTED design.

    Padded lanes must carry id == INVALID_ID (their scores are ignored);
    scores must be non-negative (importance = grad norms / frequencies —
    the reference never feeds negatives either, sk_embedding_bag.py:155).
    Equivalent to the reference's batch_insert_val loop
    (sketch.cpp:142-150).

    Why sorted: on this hardware EVERY scatter/segment-reduction runs a
    serial per-lane loop (~250-400 us at 53k lanes regardless of payload
    width — tools/profile_lines.py), while wide-row gathers, sorts, and
    1-D scans are fast vectorized ops. The design therefore (a) sorts the
    batch by (bucket, id) once so all coordination becomes neighbor logic
    and cumulative scans, and (b) funnels EVERYTHING that must land on
    the [S, C] arrays through exactly ONE B-lane segment reduction:

      * duplicate (bucket, id) lanes become contiguous groups; group score
        totals come from cumsum differences (scores >= 0 keeps the running
        sum monotone, so segment ends broadcast with one cummax);
      * the bucket's cells are read with ONE wide-row gather of the packed
        [S, 3C] (val | cnt bits | dic) view (_pack_cells);
      * the per-bucket new-id winner is the first unmatched group in each
        bucket segment (one cummax); its victim cell EXCLUDES cells that
        matched this batch (their set broadcasts per bucket as a C-bit
        mask via two more scans), so every (bucket, cell) has AT MOST ONE
        writer this call — matched cells get their own group's
        accumulation, the placed cell gets the winner;
      * with <=1 writer per cell, each writer encodes the ABSOLUTE new
        (val, cnt) payload — cnt as its order-isomorphic non-negative f32
        bit pattern — and ONE sorted segment-max over the packed [B, 2C]
        encoding (-1 = no write) lands the whole update (ops/
        sorted_update.seg_max);
      * promotion applies to MATCHED cells whose post-add count crosses
        the threshold — the reference's exact rule (sketch.cpp:113-118
        checks after incrementing the inserted id; brand-new placements
        never promote on the call that placed them). Promotions compact
        to PROMO_LANES by one stable argsort; slots, the dic update (a
        tiny PROMO_LANES-lane segment-max), and the migration report all
        run at PROMO_LANES, never B. Overflow candidates keep their
        counts and promote on a later touch (lossless, same mechanism
        the sharded cap uses);
      * round 2 re-tries the losing new-id groups (distinct ids that lost
        the bucket race) compacted to PROMO_LANES lanes the same way:
        pure placement against the materialized round-1 arrays —
        pre-merged duplicates can never match round 1's placements.

    Semantic canonicalization vs the sequential C++ (documented, tested
    statistically): the eviction victim is the min-count UNMATCHED
    unprotected cell; a bucket whose cells all matched or hold slots
    defers the newcomer to a later batch (rare: needs C simultaneous
    distinct matches in one bucket in one batch).
    """
    b = ids.shape[0]
    s, c = cfg.buckets, cfg.cells
    sp = state.val.shape[0]  # physical (padded) rows; used as drop index
    k = jnp.float32(cfg.threshold)
    pl = min(b, PROMO_LANES)

    valid = ids != INVALID_ID
    scores = jnp.where(valid, jnp.maximum(scores, 0.0), 0.0)

    # occasional global decay (sketch.cpp:135: tot > s*k*10). Round-5
    # restructure (profile_insert: the old cond carried cnt+dic and its
    # join COPIED both [S, C] arrays every step, ~200 us): the decay
    # factor applies as unconditional elementwise math that fuses into
    # the pack kernel below — f == 1.0 multiplies bit-exactly, and
    # `demote` is naturally all-False then because a hot cell always
    # holds cnt >= threshold (promotion requires it; counts only grow
    # between decays). Only the [S*C]-lane free-list push (cumsum +
    # scatter) stays behind the cond, carrying just the small free/
    # free_top leaves.
    do_decay = state.tot > jnp.float32(s) * k * 10.0
    fdec = jnp.where(do_decay, jnp.float32(cfg.decay), jnp.float32(1.0))
    demote = (state.dic != 0) & (state.cnt * fdec < k)
    cnt = state.cnt * fdec
    dic = jnp.where(demote, 0, state.dic)

    def _push(args):
        free, free_top = args
        return push_slots(free, free_top, state.dic.reshape(-1),
                          demote.reshape(-1))

    free, free_top = jax.lax.cond(
        do_decay, _push, lambda a: a, (state.free, state.free_top))
    val = state.val
    tot = jnp.where(do_decay, 0.0, state.tot)

    # ---- sort by (bucket, id); invalid lanes key to bucket s (the end)
    h = jnp.where(valid, _bucket_of(cfg, ids), s)
    h_s, id_s, sc_s = jax.lax.sort((h, ids, scores), num_keys=2)
    ok = h_s < s
    hsafe = jnp.minimum(h_s, sp - 1)

    # group boundaries: a group = one distinct (bucket, id)
    same_prev = (h_s == _prev(h_s, -1)) & (id_s == _prev(id_s, -1))
    rep = ok & ~jnp.concatenate([same_prev[1:], jnp.zeros((1,), bool)])
    # ^ rep = LAST lane of each group (next lane differs), valid only

    # group score totals: cs is monotone (scores >= 0), so the previous
    # group's end-cumsum broadcasts with one exclusive cummax
    cs = jnp.cumsum(sc_s)
    pe = _prev(jax.lax.cummax(jnp.where(rep, cs, 0.0)), 0.0)
    gtot = cs - pe  # valid at rep lanes

    # ---- match against existing cells: ONE packed wide-row gather, then
    # ALL per-cell logic in TRANSPOSED [C, B] layout. XLA materializes
    # inter-fusion intermediates padded to 128 lanes on the minor axis —
    # a [B, C] boolean/float at C=4 occupies ~27 MB on disk-layout and
    # costs 50-100 us per fusion boundary (tools/profile_lines.py); the
    # same value as [C, B] is ~3.4 MB.
    from ..ops.sorted_update import seg_max
    cells = jnp.arange(c, dtype=jnp.int32)
    cellsT = cells[:, None]                              # [C, 1]
    # pack the PRE-decay state arrays — the exact op the fwd query's
    # query_cells builds from the same inputs, so XLA CSE shares ONE
    # [S, 3C] materialization per step (at CriteoTB sizes the pack
    # alone is a 77 MB / ~440 us pass; profile_train_128.txt showed it
    # twice). Decay then applies PER-LANE to the gathered rows below —
    # bit-identical to decaying the table first (same f32 multiply on
    # the same values; the demote rule mirrors the state-side one).
    prowT = _pack_cells(state.val, state.cnt, state.dic)[hsafe].T
    # force ONE materialization: without the barrier XLA rematerializes
    # the 53k-row gather inside every consumer fusion (~40 us each)
    prowT = jax.lax.optimization_barrier(prowT)
    bv = prowT[:c]
    bc = jax.lax.bitcast_convert_type(prowT[c:2 * c], jnp.float32) * fdec
    bd0 = prowT[2 * c:]
    bd = jnp.where((bd0 != 0) & (bc < k), 0, bd0)
    occ = bc > 0.0
    m = occ & (bv == id_s[None, :])                      # [C, B]
    m_any = m.any(axis=0)
    cell_m = jnp.argmax(m, axis=0).astype(jnp.int32)
    matched = m_any & rep
    bc_m = jnp.sum(jnp.where(m, bc, 0.0), axis=0)
    bd_m = jnp.sum(jnp.where(m, bd, 0), axis=0)

    # ---- per-bucket matched-cell bitmask (broadcast over the bucket's
    # lane segment with two scans: cumsum of the <=1-per-cell bit
    # contributions is monotone, so segment start/end broadcast with a
    # prefix cummax / suffix cummin)
    nxt_h = jnp.concatenate([h_s[1:], jnp.full((1,), -1, h_s.dtype)])
    rep_b = ok & (h_s != nxt_h)          # last lane of each bucket
    mbits = jnp.where(matched, jnp.int32(1) << cell_m, 0)
    csb = jnp.cumsum(mbits)
    start_b = _prev(jax.lax.cummax(jnp.where(rep_b, csb, 0)), 0)
    end_b = jax.lax.cummin(jnp.where(rep_b, csb, jnp.int32(2**31 - 1)),
                           reverse=True)
    bucket_mbits = end_b - start_b       # C-bit mask of matched cells
    cell_is_matched = ((bucket_mbits[None, :] >> cellsT) & 1) > 0

    # ---- per-bucket winner among new-id groups: first unmatched rep in
    # each bucket segment (h_s is non-decreasing -> cummax is segment-max)
    un = rep & ~m_any
    prev_un_bucket = _prev(jax.lax.cummax(jnp.where(un, h_s, -1)), -1)
    winner = un & (prev_un_bucket != h_s)

    # victim: min-count cell among UNMATCHED unprotected occupied cells
    # (matched exclusion makes every (bucket, cell) single-writer; see
    # docstring). Empty cells are taken first, as in sketch.cpp:110-112.
    has_empty = (~occ).any(axis=0)
    cell_e = jnp.argmax(~occ, axis=0).astype(jnp.int32)
    evictable = occ & (bd == 0) & ~cell_is_matched
    bc_vic = jnp.where(evictable, bc, jnp.inf)
    cell_v = jnp.argmin(bc_vic, axis=0).astype(jnp.int32)
    can_evict = jnp.isfinite(jnp.min(bc_vic, axis=0))
    use_cell = jnp.where(has_empty, cell_e, cell_v)
    placed = winner & (has_empty | can_evict)
    # the victim's count (0 for empty cells by invariant) is inherited —
    # Space-Saving eviction, sketch.cpp:113-124
    bc_u = jnp.sum(jnp.where(use_cell[None, :] == cellsT, bc, 0.0),
                   axis=0)
    place_cnt = bc_u + gtot

    # ---- promotion: matched cells crossing the threshold (placements
    # never target matched cells now, so no evicted-cell exclusion).
    # Slot rank runs over full lanes (cheap cumsum); the actual free-list
    # gather and dic write run at PROMO_LANES below.
    cand = matched & (bc_m + gtot >= k) & (bd_m == 0)
    rank = jnp.cumsum(cand.astype(jnp.int32))
    bound = jnp.minimum(free_top, pl)
    got = cand & (rank <= bound)
    ft0 = free_top
    free_top = free_top - jnp.minimum(rank[-1], bound)

    # ---- THE B-lane segment reduction: every writer encodes its cell's
    # ABSOLUTE new (val, cnt) — cnt as non-negative f32 bits, which are
    # order-isomorphic int32 — keyed by the FLAT destination element
    # bucket*C + target-cell, so the reduction carries exactly TWO
    # channels. The serial reduce loop costs ~1.1 ns per lane*channel
    # (tools/profile_lines.py: [53k, 8] = 479 us, [53k, 2] = ~125 us), so
    # channel count is the lever. -1 = no write; <=1 writer per element.
    # (Measured alternatives at 53k lanes: flat bucket*C+cell keys with 2
    # channels cost ~670 us unsorted / ~540 us sorted — the bucket-keyed
    # [B, 2C] sorted form below is the cheapest at ~430 us; segment cost
    # is per-LANE, channels are nearly free.)
    mask_p = placed[None, :] & (use_cell[None, :] == cellsT)   # [C, B]
    mask_w = (m & matched[None, :]) | mask_p
    cnt_new = jnp.where(matched, bc_m + gtot, place_cnt)
    cnt_bits = jax.lax.bitcast_convert_type(
        cnt_new.astype(jnp.float32), jnp.int32)
    from ..ops.sorted_update import land_max, use_scatter_landing
    scatter_mode = use_scatter_landing(cfg.land_impl, s)
    if scatter_mode:
        # SCATTER landing (round 5, big-S mode): every landing/merge
        # above works on [S, C]-shaped intermediates — at CriteoTB
        # sketch sizes (S ~ 1.6M) each segment reduction materializes a
        # 51 MB output and each where-merge streams 26 MB, ~1.8 ms of
        # O(S) traffic per insert (docs/r5_measurements/
        # profile_train_128.txt). Updates touch <= B cells, so scatter
        # them in place instead (O(touched)); bit-identical to the
        # landing path (tests/test_sketch.py::TestLandImplEquivalence):
        # * cnt: one row scatter-MAX — the new count strictly exceeds
        #   the cell's old value in every write case (matched adds
        #   gtot > 0; placements inherit the victim's count + gtot), so
        #   max == set, and non-written cells keep their value via the
        #   -1 payload;
        # * val: winners are <= 1 per bucket — an element scatter-set;
        # * dic (below): the compacted PROMO_LANES report scatters
        #   directly instead of the dmx segment-max + [S, C] merge.
        cnt_pay = jnp.where(mask_w.T, cnt_new[:, None].astype(cnt.dtype),
                            -1.0)                              # [B, C]
        cnt = cnt.at[jnp.where(ok, h_s, sp)].max(cnt_pay, mode="drop")
        val = val.at[jnp.where(placed, h_s, sp), use_cell].set(
            id_s, mode="drop")
        val_rows = cnt_rows = None
    elif cfg.max_id <= (1 << 27) and c <= 16:
        # PACKED landing (round 5): the placed write is <= 1 per bucket,
        # so (target cell, id) pack into ONE channel — C+1 channels
        # instead of 2C through the serial segment reduction (its cost
        # is linear in channels). Requires ids < 2^27 (cell uses the
        # next 4 bits; 2^31 headroom).
        enc_pl = jnp.where(placed, (use_cell << 27) | id_s, -1)  # [B]
        encT = jnp.concatenate(
            [enc_pl[None, :],
             jnp.where(mask_w, cnt_bits[None, :], -1)], axis=0)
        mx = land_max(encT.T, h_s, s, cfg.land_impl)     # [S, C+1]
        mp = mx[:, 0]                                    # packed place
        p_cell_row = mp >> 27
        p_val_row = mp & ((1 << 27) - 1)
        val_rows = jnp.where(
            (mp[:, None] >= 0) & (p_cell_row[:, None] == cells[None, :]),
            p_val_row[:, None], val[:s])
        cnt_rows = jnp.where(
            mx[:, 1:] >= 0,
            jax.lax.bitcast_convert_type(mx[:, 1:], jnp.float32),
            cnt[:s])
    else:
        encT = jnp.concatenate(
            [jnp.where(mask_p, id_s[None, :], -1),
             jnp.where(mask_w, cnt_bits[None, :], -1)], axis=0)  # [2C, B]
        mx = land_max(encT.T, h_s, s, cfg.land_impl)     # [S, 2C]
        val_rows = jnp.where(mx[:, :c] >= 0, mx[:, :c], val[:s])
        cnt_rows = jnp.where(
            mx[:, c:] >= 0,
            jax.lax.bitcast_convert_type(mx[:, c:], jnp.float32),
            cnt[:s])

    # ---- compact the promotion report; slots + dic update at PROMO_LANES.
    # ONE stable priority sort compacts promotions (prio 0) AND round-2
    # losers (prio 1) together, and ONE [B, 5]-packed row gather fetches
    # all per-lane report fields — 1-D gathers cost ~29 us EACH even at
    # 4k lanes on this runtime (tools/profile_lines.py) while a packed
    # row gather is <1 us.
    loser = un & ~winner
    prio = jnp.where(got, 0, jnp.where(loser, 1, 2))
    order = jnp.argsort(prio, stable=True).astype(jnp.int32)
    lane_tab = jnp.stack(
        [id_s, h_s, cell_m, rank,
         jax.lax.bitcast_convert_type(gtot, jnp.int32)], axis=1)
    n_got = jnp.minimum(rank[-1], bound)
    rp = lane_tab[order[:pl]]                            # [pl, 5]
    presp = jnp.arange(pl, dtype=jnp.int32) < n_got
    p_id = rp[:, 0]
    p_h = jnp.where(presp, rp[:, 1], s)
    p_cell = rp[:, 2]
    r_c = rp[:, 3]
    slot = jnp.where(presp, free[jnp.clip(ft0 - r_c, 0,
                                          free.shape[0] - 1)], 0)
    if scatter_mode:
        # direct scatter of the compacted report (unique (bucket, cell)
        # per promotion) instead of the dmx segment-max + [S, C] merge
        dic = dic.at[jnp.where(presp, p_h, sp), p_cell].set(
            slot, mode="drop")
        dic_rows = None
    else:
        dic_enc = jnp.where(presp[:, None] & (p_cell[:, None] == cells),
                            slot[:, None], -1)
        dmx = seg_max(dic_enc, p_h, s)                   # tiny: pl lanes
        dic_rows = jnp.where(dmx >= 0, dmx, dic[:s])

    # ---- round 2: losing new-id groups retry against the MATERIALIZED
    # round-1 arrays (pure placement; pre-merged duplicates can never
    # match round-1 placements, which hold OTHER ids; freshly placed
    # cells never promote, sketch.cpp:113-118). Round-2 may evict a
    # round-1-matched cell — its post-add count is inherited, standard
    # Space-Saving; round-1 promotions are respected via dic_rows.
    if cfg.insert_rounds > 1:
        # loser lanes follow the got lanes in the priority sort. The
        # slice start must NEVER clamp: at pl == B (batches <=
        # PROMO_LANES) dynamic_slice(order, n_got, pl) would clamp its
        # start back to 0 and hand round 2 the PROMOTED lanes — round 2
        # then re-places already-matched ids, duplicating them across
        # cells (round-5 bug fix; caught by the land-impl equivalence
        # test's single-writer corruption). Pad instead: positions past
        # loser.sum() are masked by l_valid, so the pad value is inert.
        order_pad = jnp.concatenate(
            [order, jnp.zeros((pl,), order.dtype)])
        rl = lane_tab[jax.lax.dynamic_slice(order_pad, (n_got,), (pl,))]
        l_valid = jnp.arange(pl, dtype=jnp.int32) < loser.sum(
            dtype=jnp.int32)
        l_h = jnp.where(l_valid, rl[:, 1], s)
        l_hsafe = jnp.minimum(l_h, s - 1)
        l_id = rl[:, 0]
        l_g = jax.lax.bitcast_convert_type(rl[:, 4], jnp.float32)
        if scatter_mode:
            # read the post-scatter arrays directly: three pl-lane
            # gathers instead of an O(S) _pack_cells materialization
            # (the data dependency on the scatters above preserves the
            # round-1 -> round-2 ordering)
            bc2 = cnt[l_hsafe]
            bd2 = dic[l_hsafe]
        else:
            prow2 = _pack_cells(val_rows, cnt_rows, dic_rows)[l_hsafe]
            bc2 = jax.lax.bitcast_convert_type(prow2[:, c:2 * c],
                                               jnp.float32)
            bd2 = prow2[:, 2 * c:]
        occ2 = bc2 > 0.0
        prev_l_bucket = _prev(jax.lax.cummax(jnp.where(l_valid, l_h, -1)),
                              -1)
        winner2 = l_valid & (prev_l_bucket != l_h)
        has_e2 = (~occ2).any(axis=1)
        cell_e2 = jnp.argmax(~occ2, axis=1)
        bc_vic2 = jnp.where(occ2 & (bd2 == 0), bc2, jnp.inf)
        cell_v2 = jnp.argmin(bc_vic2, axis=1)
        can_e2 = jnp.isfinite(jnp.min(bc_vic2, axis=1))
        use2 = jnp.where(has_e2, cell_e2, cell_v2)
        placed2 = winner2 & (has_e2 | can_e2)
        bc_u2 = jnp.sum(jnp.where(use2[:, None] == cells, bc2, 0.0),
                        axis=1)
        if scatter_mode:
            h2 = jnp.where(placed2, l_h, sp)
            val = val.at[h2, use2].set(l_id, mode="drop")
            cnt = cnt.at[h2, use2].set(
                (bc_u2 + l_g).astype(cnt.dtype), mode="drop")
        else:
            cb2 = jax.lax.bitcast_convert_type(
                (bc_u2 + l_g).astype(jnp.float32), jnp.int32)
            mask_p2 = placed2[:, None] & (use2[:, None] == cells)
            enc2 = jnp.concatenate(
                [jnp.where(mask_p2, l_id[:, None], -1),
                 jnp.where(mask_p2, cb2[:, None], -1)], axis=1)
            mx2 = seg_max(enc2, l_h, s)  # l_h sorted (stable prio sort)
            val_rows = jnp.where(mx2[:, :c] >= 0, mx2[:, :c], val_rows)
            cnt_rows = jnp.where(
                mx2[:, c:] >= 0,
                jax.lax.bitcast_convert_type(mx2[:, c:], jnp.float32),
                cnt_rows)

    if not scatter_mode:
        cnt = jnp.concatenate([cnt_rows, cnt[s:]], axis=0)
        val = jnp.concatenate([val_rows, val[s:]], axis=0)
        dic = jnp.concatenate([dic_rows, dic[s:]], axis=0)

    new_state = HotSketchState(
        val=val, cnt=cnt, dic=dic, free=free, free_top=free_top,
        tot=tot + scores.sum(),
    )
    res = InsertResult(
        ids=jnp.where(presp, p_id, INVALID_ID),
        slots=slot, mask=presp, bucket=p_h, cell=p_cell)
    return new_state, res


def revert_promotions(cfg: HotSketchConfig, state: HotSketchState,
                      ids: jnp.ndarray, promo: InsertResult,
                      excess: jnp.ndarray) -> HotSketchState:
    """Undo the promotions on `excess` lanes of an InsertResult: clear the
    cell's slot and push it back on the free stack. Lossless — the id
    keeps its count above threshold and re-promotes on its next touch.
    Used by the sharded step to bound the per-step migration exchange.

    `ids` is unused (kept for signature parity with
    revert_promotions_plus, which re-hashes); the promoted cells are
    located by the InsertResult's own (bucket, cell) coordinates."""
    del ids
    sp = state.val.shape[0]
    live = excess & promo.mask
    dic = state.dic.at[jnp.where(live, promo.bucket, sp),
                       promo.cell].set(0, mode="drop")
    free, free_top = push_slots(state.free, state.free_top, promo.slots,
                                live)
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
