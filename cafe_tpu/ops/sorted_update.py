"""Scatter-free sorted-segment updates (the round-4 MFU fix).

XLA lowers TPU scatters with dynamic indices to a per-lane serial loop:
measured ~0.5 ms per 53k-lane scatter on v5e regardless of payload width
(docs/PERF.md). Every op in the CAFE hot path that used to be a scatter is
re-expressed here as sort + cumulative-sum + searchsorted + gather — all
fully parallel VPU work — plus ONE elementwise pass over the destination
array. That trades O(lanes) serial iterations for O(dest) streaming bytes,
a win whenever the destination is not enormously larger than the batch
(at the bench protocol the CAFE table is ~27k rows x 16 while a scatter
costs 53k serial lane-iterations).

Three primitives:

* `row_ranges(sorted_keys, n_rows)` — per destination row, the [lo, hi)
  lane range of its segment in a sorted key array (2 searchsorteds).
* `compact_positions(mask, k)` — lane positions of the first k True lanes
  (cumsum + searchsorted), replacing argsort/scatter-based compaction.
* `segment_sum_to_rows(...)` / `unique_lane_to_rows(...)` — per-row
  segment reductions by prefix-sum difference / rank-searchsorted.

plus `apply_rows_pass(...)`: the full sparse optimizer apply
(sgd/adagrad/adam, same math as ops/sparse.py) as one sort + one
elementwise pass over the table — used automatically by
ops.sparse.apply_rows when the table is small enough for the pass to beat
the serial scatter (see `PASS_ROW_FACTOR`).

Reference counterpart: the OpenMP C++ sketch insert hot loop
(ArtifactEvaluation/embeddings/sketch.cpp:89-150) and torch's coalesced
sparse optimizer steps; both are host/CUDA designs whose TPU-native
equivalent is this sorted, scatter-free form.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def row_ranges(sorted_keys: jnp.ndarray, n_rows: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each destination row r in [0, n_rows): the half-open lane range
    [lo[r], hi[r)) of key == r in `sorted_keys` (ascending, NON-NEGATIVE;
    sentinel keys >= n_rows sort to the end and fall outside every range).

    One searchsorted (method='sort': one extra lax.sort over keys+queries,
    ~38 us at 53k keys x 27k rows on v5e — the 'scan' binary search costs
    ~5x that) gives hi; for integer keys and the dense query set,
    lo[r] = #keys < r = #keys <= r-1 = hi[r-1]."""
    rows = jnp.arange(n_rows, dtype=sorted_keys.dtype)
    hi = jnp.searchsorted(sorted_keys, rows, side="right",
                          method="sort").astype(jnp.int32)
    lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), hi[:-1]])
    return lo, hi


def compact_positions(mask: jnp.ndarray, k: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane positions of the first k True lanes of `mask` [B], in lane
    order: returns (pos [k] int32, valid [k] bool). pos is clipped to B-1
    on invalid lanes (gather-safe); scatter-free replacement for
    `argsort(~mask, stable=True)[:k]` compaction."""
    rank = jnp.cumsum(mask.astype(jnp.int32))
    pos = jnp.searchsorted(rank, jnp.arange(1, k + 1, dtype=jnp.int32),
                           side="left", method="scan_unrolled"
                           ).astype(jnp.int32)
    valid = jnp.arange(k, dtype=jnp.int32) < rank[-1]
    return jnp.minimum(pos, mask.shape[0] - 1), valid


def segment_sum_to_rows(svals: jnp.ndarray, lo: jnp.ndarray,
                        hi: jnp.ndarray) -> jnp.ndarray:
    """Per destination row, the sum of svals [B, ...] over its [lo, hi)
    segment, by prefix-sum difference. One [B, ...] cumsum + two [R, ...]
    gathers. Integer dtypes are exact (mind overflow of the GLOBAL total).
    Float note: the diff of two running sums can differ from a direct
    segment sum in the last bits (same numeric class as the sketch's gtot
    cummax trick); empty segments return exactly 0 (same-index diff)."""
    csum = jnp.cumsum(svals, axis=0)
    zero = jnp.zeros((1,) + svals.shape[1:], svals.dtype)
    csum0 = jnp.concatenate([zero, csum], axis=0)
    return csum0[hi] - csum0[lo]


_POS_SHIFT = 11  # contributor_pos_to_rows splits lane+1 into 11-bit limbs


def contributor_pos_to_rows(mask: jnp.ndarray, lo: jnp.ndarray,
                            hi: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per destination row, the lane position of THE masked contributor in
    its [lo, hi) segment — for writes with at most ONE contributing lane
    per row (exact scatter-set semantics). mask may be [B] or [B, C]
    (lo/hi then index rows of a [R]- or [R, C]-write).

    Uses the sum-of-(lane+1) identity: with <=1 contributor, the segment
    sum IS lane+1 (0 if absent). lane+1 is split into two 11-bit limbs so
    the GLOBAL int32 prefix sums cannot overflow up to B ~= 10^6 lanes
    (low limb <= 2047*B, high limb <= B*B/2048; both < 2^31 for B <= 1M —
    far above any training-batch lane count; asserted below).
    Returns (pos clipped to [0, B-1], present)."""
    assert mask.shape[0] <= (1 << 20), \
        "contributor_pos_to_rows: lane count exceeds the int32-safe bound"
    b = mask.shape[0]
    lane1 = jnp.arange(1, b + 1, dtype=jnp.int32)
    if mask.ndim == 2:
        lane1 = lane1[:, None]
    hi_limb = jnp.where(mask, lane1 >> _POS_SHIFT, 0)
    lo_limb = jnp.where(mask, lane1 & ((1 << _POS_SHIFT) - 1), 0)
    a = segment_sum_to_rows(hi_limb, lo, hi)
    c = segment_sum_to_rows(lo_limb, lo, hi)
    p = (a << _POS_SHIFT) + c  # lane+1, or 0 if no contributor
    return jnp.clip(p - 1, 0, b - 1), p > 0


_G1W = 8  # gather_1d row width


def gather_1d(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr[idx] for 1-D arr, lowered as a WIDE-ROW gather + one-hot select.
    TPU profile (docs/r4_measurements): a 53k-lane gather from a 1-D array
    costs ~29 us while the same lane count gathering 16-byte rows costs
    ~5 us — XLA's row-oriented gather vectorizes, per-element addressing
    does not. Reshaping to [N/8, 8] rows buys the fast path. idx must be
    in-range (clip upstream)."""
    n = arr.shape[0]
    pad = (-n) % _G1W
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,), arr.dtype)])
    rows = arr.reshape(-1, _G1W)[idx // _G1W]  # [..., W]
    sub = (idx % _G1W)[..., None] == jnp.arange(_G1W, dtype=idx.dtype)
    return jnp.sum(jnp.where(sub, rows, 0), axis=-1)


# Use the table-pass apply when the table has at most this many rows per
# update lane: the pass streams ~3-4 table-sized arrays while the scatter
# burns ~10 ns of serial loop per lane (~50x HBM row-throughput), so the
# break-even is near 30x; 8x keeps a wide safety margin for the extra
# sort/cumsum work.
PASS_ROW_FACTOR = 8


def use_table_pass(n_rows: int, n_lanes: int) -> bool:
    return n_rows <= PASS_ROW_FACTOR * n_lanes


def apply_rows_pass(table: jnp.ndarray, slots: dict, idx: jnp.ndarray,
                    grad: jnp.ndarray, lr: float, optimizer: str):
    """Sparse optimizer apply as a full-table pass (math of
    ops.sparse.apply_rows: duplicates coalesce first, then one
    sgd/adagrad/adam row step). idx [B] int32 (out-of-range = dropped
    lanes), grad [B, D]. Returns (table, slots)."""
    n = table.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    sgrad = grad[order]
    lo, hi = row_ranges(sidx, n)
    touched = hi > lo
    g = segment_sum_to_rows(sgrad, lo, hi)  # [N, D] coalesced grads
    g = jnp.where(touched[:, None], g, 0.0)

    if optimizer == "adagrad":
        acc = slots["acc"] + g * g
        std = jnp.sqrt(acc) + 1e-10
        table = table + jnp.where(touched[:, None],
                                  (-lr * g / std).astype(table.dtype), 0.0)
        return table, {"acc": acc}
    if optimizer == "adam":
        b1, b2, eps = 0.9, 0.999, 1e-8
        m, v, t = slots["m"], slots["v"], slots["t"]
        t = t + 1
        m_rows = b1 * m + (1.0 - b1) * g
        v_rows = b2 * v + (1.0 - b2) * (g * g)
        m = jnp.where(touched[:, None], m_rows, m)
        v = jnp.where(touched[:, None], v_rows, v)
        tf = t.astype(jnp.float32)
        upd = lr * (m_rows / (1.0 - b1 ** tf)) / (
            jnp.sqrt(v_rows / (1.0 - b2 ** tf)) + eps)
        table = table - jnp.where(touched[:, None],
                                  upd.astype(table.dtype), 0.0)
        return table, {"m": m, "v": v, "t": t}
    # sgd
    table = table + (-lr * g).astype(table.dtype)
    return table, {}
