"""CAFE+ two-tier HotSketch (TOIS'25), device-resident.

Functional JAX re-design of the reference's second-generation sketch
(tricks/sketch.cpp, hardened copy at TOIS_revision/PinSAGE/sketch.cpp):

* **Main tier** (90% of buckets): like v1, but new ids do NOT enter here
  directly — only ids graduating from staging (sketch.cpp:211-231).
* **Staging tier** (10%): an LRU cache of candidate ids with timestamps.
  A staged id crossing the threshold is moved into the main tier carrying
  its count and hot slot (:179-187). The LRU evictee is moved to the main
  tier too if it earned a slot or accumulated count >= 5 (:193-195).
* **Lazy exponential decay**: per batch `decay_acc *= alpha`; when it
  exceeds V=10000 the threshold is divided by V and every counter is
  (lazily, via flip bits) divided by V (:266-273, 130-140). On TPU the lazy
  flip-bit trick is pointless — a full-array multiply is one HBM pass — so
  the division is applied eagerly; the math is identical.
* **Adaptive threshold**: `real_n` counts ids that crossed the threshold;
  when it exceeds 1.2x the hot capacity, `reset()` globally ranks all
  candidate cells by count, keeps the top `lim` hot, frees the rest, and
  raises the threshold to the cut-off count (:76-116). Here reset is a
  jitted sort + prefix-sum slot shuffle.

The threshold lives in *state* (it adapts), unlike v1 where it is static
config. Query consults both tiers (v3 behavior, PinSAGE/sketch.cpp:149-160).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hotsketch import INVALID_ID, InsertResult, alloc_slots, push_slots

_H1 = np.uint32(2654435761)
_H2 = np.uint32(0x85EBCA6B)

DECAY_V = 10000.0
LRU_MOVE_MIN_CNT = 5.0  # sketch.cpp:193 — evictee worth keeping


class CafePlusConfig(NamedTuple):
    lim: int                  # hot-slot capacity (== v1 `buckets`)
    threshold: float          # initial promotion threshold
    alpha: float = 1.000001   # per-batch decay growth (sketch.cpp:9)
    adjust_threshold: bool = True
    cells: int = 4
    insert_rounds: int = 2
    # OPT-IN deviation from the reference: a newcomer displacing a
    # DISCARDED staging victim inherits its count (v1's Space-Saving
    # rule, AE sketch.cpp:113-124). The reference's insertLRU starts
    # newcomers from their own count (tricks/sketch.cpp:199-203), which
    # starves mid-band ids at extreme compression — every eviction
    # throws their accumulated evidence away. Off by default for parity.
    inherit: bool = False
    # staging tier's share of the buckets; the reference hard-codes 0.1
    # (sketch.cpp:29-35). A bigger share helps when the id flow per
    # staging bucket is extreme (tight compression, huge batches).
    staging_frac: float = 0.1

    @property
    def n1(self) -> int:
        return max(int(self.lim * (1.0 - self.staging_frac)), 1)

    @property
    def n2(self) -> int:
        return max(int(self.lim * self.staging_frac), 1)


class CafePlusState(NamedTuple):
    val1: jnp.ndarray   # int32 [n1p, C]
    cnt1: jnp.ndarray   # f32   [n1p, C]
    dic1: jnp.ndarray   # int32 [n1p, C]
    val2: jnp.ndarray   # int32 [n2p, C]
    cnt2: jnp.ndarray   # f32   [n2p, C]
    dic2: jnp.ndarray   # int32 [n2p, C]
    ts2: jnp.ndarray    # int32 [n2p, C] LRU timestamps
    free: jnp.ndarray   # int32 [limp] free hot-slot stack
    free_top: jnp.ndarray   # int32 []
    threshold: jnp.ndarray  # f32 [] adaptive
    real_n: jnp.ndarray     # int32 [] ids that crossed threshold
    decay_acc: jnp.ndarray  # f32 []
    step: jnp.ndarray       # int32 [] timestamp source


def _pad(n: int) -> int:
    from ..embeddings.base import round_up
    return round_up(n)


def init_sketch_plus(cfg: CafePlusConfig) -> CafePlusState:
    c = cfg.cells
    n1p, n2p, limp = _pad(cfg.n1), _pad(cfg.n2), _pad(cfg.lim)
    free = np.zeros(limp, dtype=np.int32)
    free[: cfg.lim - 1] = np.arange(1, cfg.lim, dtype=np.int32)
    z = lambda n, d: jnp.zeros((n, c), dtype=d)  # noqa: E731
    return CafePlusState(
        val1=z(n1p, jnp.int32), cnt1=z(n1p, jnp.float32),
        dic1=z(n1p, jnp.int32),
        val2=z(n2p, jnp.int32), cnt2=z(n2p, jnp.float32),
        dic2=z(n2p, jnp.int32), ts2=z(n2p, jnp.int32),
        free=jnp.asarray(free),
        free_top=jnp.asarray(cfg.lim - 1, jnp.int32),
        threshold=jnp.asarray(cfg.threshold, jnp.float32),
        real_n=jnp.asarray(0, jnp.int32),
        decay_acc=jnp.asarray(1.0, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def _h1(cfg, ids):
    return ((ids.astype(jnp.uint32) * _H1) % jnp.uint32(cfg.n1)).astype(
        jnp.int32)


def _h2(cfg, ids):
    return ((ids.astype(jnp.uint32) * _H2) % jnp.uint32(cfg.n2)).astype(
        jnp.int32)


def sketch_query_plus(cfg: CafePlusConfig, st: CafePlusState,
                      ids: jnp.ndarray) -> jnp.ndarray:
    """-hot_slot if hot (either tier, v3 semantics) else the id."""
    occupied = ids != INVALID_ID

    h1 = _h1(cfg, ids)
    m1 = (st.cnt1[h1] > 0) & (st.val1[h1] == ids[:, None]) & \
        (st.dic1[h1] != 0)
    slot1 = jnp.max(jnp.where(m1, st.dic1[h1], 0), axis=1)

    h2 = _h2(cfg, ids)
    m2 = (st.cnt2[h2] > 0) & (st.val2[h2] == ids[:, None]) & \
        (st.dic2[h2] != 0)
    slot2 = jnp.max(jnp.where(m2, st.dic2[h2], 0), axis=1)

    slot = jnp.maximum(slot1, slot2)
    return jnp.where(occupied & (slot > 0), -slot, ids)


# slot-stack discipline shared with the v1 sketch (single source of truth)
_alloc = alloc_slots
_push = push_slots


def analyse_plus(cfg: CafePlusConfig, st: "CafePlusState",
                 ids: jnp.ndarray) -> jnp.ndarray:
    """Fraction of `ids` currently HOT in either tier — the CAFE+
    in-training recall probe (tricks/sketch.cpp:314-320's `analyse` on the
    two-tier sketch). Note on `batch_insert_start` (PinSAGE/sketch.cpp:
    438-440): the reference resets a per-backward dedup map so each
    distinct id inserts once per step; the batched insert here sorts and
    segment-sums duplicates within the batch, which is the same dedup
    performed implicitly — no separate call exists or is needed."""
    return jnp.mean(sketch_query_plus(cfg, st, ids) < 0)


def _main_tier_insert(cfg, val1, cnt1, dic1, free, free_top,
                      ids, counts, dics, mask):
    """Batched analogue of sketch.cpp:232-259 `Insert`: place (id, count,
    dic) into the main tier — empty cell first, else overwrite the min-count
    cell if it is not hot (the count ACCUMULATES into the victim's, :250);
    if the min cell is hot the item is dropped and its slot freed.

    Returns updated arrays and the not-placed mask (droppees)."""
    n1p = val1.shape[0]
    lanes_h = _h1(cfg, ids)
    placed = jnp.zeros_like(mask)
    for _ in range(cfg.insert_rounds):
        pend = mask & ~placed
        bv, bc, bd = val1[lanes_h], cnt1[lanes_h], dic1[lanes_h]
        occ = bc > 0
        has_empty = (~occ).any(axis=1)
        cell_e = jnp.argmax(~occ, axis=1)
        cell_m = jnp.argmin(bc, axis=1)
        use_empty = pend & has_empty
        lane_idx = jnp.arange(ids.shape[0])
        can_evict = pend & ~has_empty & (bd[lane_idx, cell_m] == 0)
        cell = jnp.where(has_empty, cell_e, cell_m)
        tryw = use_empty | can_evict
        hw = jnp.where(tryw, lanes_h, n1p)
        val1 = val1.at[hw, cell].set(ids, mode="drop")
        won = tryw & (val1[lanes_h, cell] == ids)
        # empty cell: set count; eviction: accumulate into victim's count
        add = jnp.where(won & use_empty,
                        counts - bc[lane_idx, cell],  # set via add
                        jnp.where(won, counts, 0.0))
        cnt1 = cnt1.at[jnp.where(won, lanes_h, n1p), cell].add(
            add, mode="drop")
        dic1 = dic1.at[jnp.where(won, lanes_h, n1p), cell].set(
            dics, mode="drop")
        placed = placed | won
    dropped = mask & ~placed
    # droppees return their slots (sketch.cpp:255-257)
    free, free_top = _push(free, free_top, dics,
                           dropped & (dics != 0))
    return val1, cnt1, dic1, free, free_top, dropped


def _reset(cfg: CafePlusConfig, st: CafePlusState) -> CafePlusState:
    """Adaptive-threshold rebuild (sketch.cpp:76-116): rank every candidate
    cell by count, top `lim` keep/gain hot slots, the rest are demoted, and
    the threshold becomes the cut-off count."""
    lim = cfg.lim
    cnt_all = jnp.concatenate([st.cnt1.reshape(-1), st.cnt2.reshape(-1)])
    dic_all = jnp.concatenate([st.dic1.reshape(-1), st.dic2.reshape(-1)])
    m = cnt_all.shape[0]
    cand = (cnt_all >= st.threshold) | (dic_all != 0)
    l = cand.sum()
    key = jnp.where(cand, cnt_all, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32))
    # slot capacity is lim-1 (slot 0 is the cold sentinel): keep at most
    # lim-1 candidates hot, everything below the cut is demoted
    cut = jnp.maximum(l - (lim - 1), 0)
    demote = cand & (rank < cut) & (dic_all != 0)
    promote = cand & (rank >= cut) & (rank < l) & (dic_all == 0)

    free, free_top = st.free, st.free_top
    sorted_dic = dic_all[order]
    sorted_demote = demote[order]
    free, free_top = _push(free, free_top, sorted_dic, sorted_demote)
    dic_all = jnp.where(demote, 0, dic_all)
    # grant slots to promoted candidates in DESCENDING-count order, so if
    # slots ever run short the lowest-count candidates are the ones denied
    rorder = order[::-1]
    sorted_promote = promote[rorder]
    slot_s, got_s, free_top = _alloc(free, free_top, sorted_promote)
    new_dic_sorted = jnp.zeros((m,), jnp.int32).at[rorder].set(
        jnp.where(got_s, slot_s, 0))
    dic_all = jnp.where(promote, new_dic_sorted, dic_all)

    # new threshold = count at the cut position: the reference takes
    # vec[l-lim].first, i.e. the HIGHEST demoted count sorted_cnt[cut-1]
    # (sketch.cpp:112)
    sorted_cnt = jnp.sort(key)
    thr = jnp.where(cut > 0, sorted_cnt[jnp.clip(cut - 1, 0, m - 1)],
                    st.threshold)
    n1e = st.cnt1.size
    return st._replace(
        dic1=dic_all[:n1e].reshape(st.dic1.shape),
        dic2=dic_all[n1e:].reshape(st.dic2.shape),
        free=free, free_top=free_top,
        threshold=thr.astype(jnp.float32),
        real_n=jnp.minimum(l, lim - 1).astype(jnp.int32),
    )


def revert_promotions_plus(cfg: CafePlusConfig, st: CafePlusState,
                           ids: jnp.ndarray, promo: "InsertResult",
                           excess: jnp.ndarray) -> CafePlusState:
    """Undo promotions on `excess` lanes: find the cell holding
    (id, slot) in either tier, clear its slot, push the slot back.
    Counts/threshold-crossing bookkeeping stay — the id re-promotes on
    its next touch (used by the sharded step's migration bound)."""
    ids = promo.ids
    slots = promo.slots
    live = excess & promo.mask & (slots != 0)
    n1p = st.val1.shape[0]
    n2p = st.val2.shape[0]
    lanes = jnp.arange(ids.shape[0])

    h1 = _h1(cfg, ids)
    m1 = live[:, None] & (st.val1[h1] == ids[:, None]) & \
        (st.dic1[h1] == slots[:, None])
    in1 = m1.any(axis=1)
    cell1 = jnp.argmax(m1, axis=1)
    dic1 = st.dic1.at[jnp.where(in1, h1, n1p), cell1].set(0, mode="drop")

    h2 = _h2(cfg, ids)
    m2 = live[:, None] & ~in1[:, None] & (st.val2[h2] == ids[:, None]) & \
        (st.dic2[h2] == slots[:, None])
    in2 = m2.any(axis=1)
    cell2 = jnp.argmax(m2, axis=1)
    dic2 = st.dic2.at[jnp.where(in2, h2, n2p), cell2].set(0, mode="drop")

    free, free_top = _push(st.free, st.free_top, slots,
                           live & (in1 | in2))
    return st._replace(dic1=dic1, dic2=dic2, free=free, free_top=free_top)


@functools.partial(jax.jit, static_argnums=0)
def sketch_insert_plus(cfg: CafePlusConfig, st: CafePlusState,
                       ids: jnp.ndarray, scores: jnp.ndarray,
                       ) -> Tuple[CafePlusState, InsertResult]:
    b = ids.shape[0]
    n1p = st.val1.shape[0]
    n2p = st.val2.shape[0]
    lanes = jnp.arange(b)

    valid_in = ids != INVALID_ID
    scores = jnp.where(valid_in, scores, 0.0)

    # ---- lazy exponential decay, applied eagerly (sketch.cpp:266-273)
    decay_acc = st.decay_acc * jnp.float32(cfg.alpha)

    def do_decay(args):
        da, thr, c1, c2 = args
        return (da / DECAY_V, thr / DECAY_V, c1 / DECAY_V, c2 / DECAY_V)

    decay_acc, threshold, cnt1, cnt2 = jax.lax.cond(
        decay_acc > DECAY_V, do_decay, lambda a: a,
        (decay_acc, st.threshold, st.cnt1, st.cnt2))
    st = st._replace(decay_acc=decay_acc, threshold=threshold,
                     cnt1=cnt1, cnt2=cnt2)

    # ---- adaptive threshold rebuild (sketch.cpp:275, 291)
    if cfg.adjust_threshold:
        st = jax.lax.cond(st.real_n > jnp.int32(cfg.lim * 1.2),
                          lambda s: _reset(cfg, s), lambda s: s, st)

    thr = st.threshold
    step = st.step + 1

    # ---- sort + dedup
    order = jnp.argsort(ids)
    sid = ids[order]
    ssc = scores[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head) - 1
    uscore = jax.ops.segment_sum(ssc, seg, num_segments=b)[seg]
    active = head & (sid != INVALID_ID)

    val1, cnt1, dic1 = st.val1, st.cnt1, st.dic1
    val2, cnt2, dic2, ts2 = st.val2, st.cnt2, st.dic2, st.ts2
    free, free_top = st.free, st.free_top
    real_n = st.real_n
    promo_slot = jnp.zeros(b, jnp.int32)

    h1 = _h1(cfg, sid)
    h2 = _h2(cfg, sid)

    # ---- 1. main-tier match (sketch.cpp:211-229)
    bv, bc, bd = val1[h1], cnt1[h1], dic1[h1]
    occ1 = bc > 0
    m1 = occ1 & (bv == sid[:, None])
    matched1 = m1.any(axis=1) & active
    cell1 = jnp.argmax(m1, axis=1)
    add = jnp.where(matched1, uscore, 0.0)
    old_cnt = bc[lanes, cell1]
    new_cnt = old_cnt + add
    cnt1 = cnt1.at[h1, cell1].add(add)
    crossed = matched1 & (new_cnt >= thr) & (old_cnt < thr)
    real_n = real_n + crossed.sum(dtype=jnp.int32)
    want = matched1 & (new_cnt >= thr) & (bd[lanes, cell1] == 0)
    slot, got, free_top = _alloc(free, free_top, want)
    dic1 = dic1.at[jnp.where(got, h1, n1p), cell1].set(slot, mode="drop")
    promo_slot = jnp.where(got, slot, promo_slot)

    # ---- 2. staging-tier path (insertLRU, sketch.cpp:161-210)
    pend = active & ~matched1
    sv, sc, sd, stt = val2[h2], cnt2[h2], dic2[h2], ts2[h2]
    occ2 = sc > 0
    m2 = occ2 & (sv == sid[:, None])
    matched2 = m2.any(axis=1) & pend
    cell2 = jnp.argmax(m2, axis=1)
    add2 = jnp.where(matched2, uscore, 0.0)
    old2 = sc[lanes, cell2]
    new2 = old2 + add2
    cnt2 = cnt2.at[h2, cell2].add(add2)
    ts2 = ts2.at[jnp.where(matched2, h2, n2p), cell2].set(step, mode="drop")
    crossed2 = matched2 & (new2 >= thr) & (old2 < thr)
    real_n = real_n + crossed2.sum(dtype=jnp.int32)
    want2 = matched2 & (new2 >= thr) & (sd[lanes, cell2] == 0)
    slot2, got2, free_top = _alloc(free, free_top, want2)
    dic2 = dic2.at[jnp.where(got2, h2, n2p), cell2].set(slot2, mode="drop")
    promo_slot = jnp.where(got2, slot2, promo_slot)

    # staged ids over threshold graduate to the main tier (:179-187)
    graduate = matched2 & (new2 >= thr)
    gdic = jnp.where(got2, slot2, sd[lanes, cell2])
    val1, cnt1, dic1, free, free_top, dropped = _main_tier_insert(
        cfg, val1, cnt1, dic1, free, free_top,
        sid, new2, gdic, graduate)
    moved = graduate & ~dropped
    # dropped graduates lost their slot in _main_tier_insert; un-promote them
    promo_slot = jnp.where(dropped & got2, 0, promo_slot)
    cleared = moved | dropped  # reference clears the staging cell either way
    hz = jnp.where(cleared, h2, n2p)
    val2 = val2.at[hz, cell2].set(0, mode="drop")
    cnt2 = cnt2.at[hz, cell2].set(0.0, mode="drop")
    dic2 = dic2.at[hz, cell2].set(0, mode="drop")
    ts2 = ts2.at[hz, cell2].set(0, mode="drop")

    # ---- 3. brand-new ids displace staging LRU victims (:193-209)
    # Batch-parallel MULTI-placement: colliding fresh ids within a bucket
    # take DISTINCT victim cells (empty cells first — ts 0 — then true LRU
    # order), so up to `cells` newcomers land per bucket per batch. The
    # sequential reference admits every newcomer, later ones evicting
    # earlier ones within the same batch; keeping the first `cells` (in
    # canonical sorted-id order) is the self-eviction-free prefix of that
    # behavior. An earlier one-representative-per-round design starved the
    # staging tier when colliders/bucket >> rounds (measured on the
    # microbench: recall 0.55 -> 0.91 at cells=16, 0.19 -> 0.97 at
    # cells=32; docs/EXPERIMENTS.md "CAFE+ microbench").
    fresh = pend & ~matched2
    # rank of each fresh lane within its bucket (lanes sharing h2 get
    # 0,1,2,... in sorted order)
    key_b = jnp.where(fresh, h2, n2p)
    order2 = jnp.argsort(key_b, stable=True)
    sh = key_b[order2]
    head2 = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
    seg_start = jax.lax.cummax(jnp.where(head2, lanes, 0))
    rank = jnp.zeros(b, jnp.int32).at[order2].set(
        (lanes - seg_start).astype(jnp.int32))

    sv, sc, sd, stt = val2[h2], cnt2[h2], dic2[h2], ts2[h2]
    c = cfg.cells
    vic_order = jnp.argsort(stt, axis=1)       # [B, C]: empties, then LRU
    placed = fresh & (rank < c)
    placed_cell = vic_order[lanes, jnp.clip(rank, 0, c - 1)]
    vval = sv[lanes, placed_cell]
    vcnt = sc[lanes, placed_cell]
    vdic = sd[lanes, placed_cell]
    occupied_v = vcnt > 0
    # displaced victims worth keeping move to the main tier (:193-195)
    vic_move = placed & occupied_v & ((vdic != 0)
                                      | (vcnt >= LRU_MOVE_MIN_CNT))
    vic_val_l = jnp.where(vic_move, vval, 0)
    vic_cnt_l = jnp.where(vic_move, vcnt, 0.0)
    vic_dic_l = jnp.where(vic_move, vdic, 0)

    hw = jnp.where(placed, h2, n2p)
    new_cnt2 = uscore
    if cfg.inherit:
        # inherit only from victims whose count is DISCARDED (not moved
        # to the main tier — those counts live on there)
        new_cnt2 = uscore + jnp.where(occupied_v & ~vic_move, vcnt, 0.0)
    val2 = val2.at[hw, placed_cell].set(sid, mode="drop")
    cnt2 = cnt2.at[hw, placed_cell].set(new_cnt2, mode="drop")
    dic2 = dic2.at[hw, placed_cell].set(0, mode="drop")
    ts2 = ts2.at[hw, placed_cell].set(step, mode="drop")
    # colliders beyond `cells` simply retry on a later batch

    # a fresh id whose placed count already clears the threshold counts
    # as a crossing and earns a slot right away (the reference's
    # insertLRU runs the same checks on the freshly placed cell,
    # sketch.cpp:200-208); it graduates to the main tier on its next
    # touch. (new_cnt2 == uscore unless cfg.inherit.)
    crossed3 = placed & (new_cnt2 >= thr)
    real_n = real_n + crossed3.sum(dtype=jnp.int32)
    slot3, got3, free_top = _alloc(free, free_top, crossed3)
    dic2 = dic2.at[jnp.where(got3, h2, n2p), placed_cell].set(
        slot3, mode="drop")
    promo_slot = jnp.where(got3, slot3, promo_slot)
    # move displaced victims (each selected exactly once above)
    val1, cnt1, dic1, free, free_top, vdropped = _main_tier_insert(
        cfg, val1, cnt1, dic1, free, free_top,
        vic_val_l, vic_cnt_l, vic_dic_l, vic_move)

    new_st = CafePlusState(
        val1=val1, cnt1=cnt1, dic1=dic1,
        val2=val2, cnt2=cnt2, dic2=dic2, ts2=ts2,
        free=free, free_top=free_top,
        threshold=thr, real_n=real_n,
        decay_acc=st.decay_acc, step=step,
    )
    res = InsertResult(ids=sid, slots=promo_slot, mask=promo_slot > 0)
    return new_st, res
