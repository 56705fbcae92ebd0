"""Scatter-free sorted-segment updates.

Measured cost model (v5e, in-step profiles — tools/profile_train.py,
tools/ab_scatter_vs_sorted.py, docs/r4_measurements/):

* a plain 53k-lane row scatter-add into a 27k-row table costs ~340 us;
  into a 2M-row table ~5.3 ms (lane cost grows with table size);
* sorted segment reductions cost ~30-55 us per lane-channel pass at 53k
  lanes (segment_sum [53k,16] -> [27k,16] = 537 us: LINEAR in channels,
  not vectorized across them);
* 53k-lane permute-gathers (grad[order]) cost ~190 us each.

Consequences: for SGD (no coalesce needed) the plain scatter WINS and
ops/sparse.apply_rows uses it; the sorted pass below wins for
adagrad/adam on streamable tables (their torch semantics demand
coalesce-first, after which the scatter chain costs more than one
table pass); the sketch insert keeps the segment-reduce design because
its writes need set-semantics with conflict resolution, not add.
(Historical: an earlier draft used searchsorted + cumsum-difference +
one-hot gathers — 200-400 us EACH at these shapes; the segment-reduce
forms replaced them and cut the sketch insert ~8x, and the insert is
now also amortized by cafe_insert_interval.)

Primitives:

* `seg_sum(vals, sorted_keys, n)` / `seg_max(...)` — sorted-hint segment
  reductions; keys >= n (sentinels) are dropped.
* `set_rows_max(dest, payload_enc, sorted_keys)` — scatter-SET semantics
  for writes with at most one non-negative contributor per destination
  row, via segment-max of a (-1)-encoded payload.
* `compact_mask(mask, k)` — lane positions of the first k True lanes
  (one stable argsort), for fixed-size promotion reports.

plus `apply_rows_pass(...)`: the full sparse optimizer apply
(sgd/adagrad/adam, same math as ops/sparse.py) as one sort + one sorted
segment-sum + one elementwise pass over the table — used automatically
by ops.sparse.apply_rows when the table is small enough for the pass to
beat the serial scatter (see `PASS_ROW_FACTOR`).

Reference counterpart: the OpenMP C++ sketch insert hot loop
(ArtifactEvaluation/embeddings/sketch.cpp:89-150) and torch's coalesced
sparse optimizer steps; both are host/CUDA designs whose TPU-native
equivalent is this sorted, scatter-free form.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def seg_sum(vals: jnp.ndarray, sorted_keys: jnp.ndarray,
            n_rows: int) -> jnp.ndarray:
    """Per destination row r in [0, n_rows): sum of vals [B, ...] over
    lanes with sorted_keys == r. Keys >= n_rows are dropped. ~29 us at
    53k lanes -> 27k rows on v5e (tools/micro_ops.py)."""
    return jax.ops.segment_sum(vals, sorted_keys, num_segments=n_rows,
                               indices_are_sorted=True)


def seg_max(vals: jnp.ndarray, keys: jnp.ndarray, n_rows: int,
            sorted: bool = True) -> jnp.ndarray:
    """Per destination row, max of vals over its key segment; empty
    segments return the dtype minimum (INT_MIN / -inf). Pass
    sorted=False when keys are only PARTIALLY sorted (e.g. flat
    bucket*C + cell destinations, ordered by bucket but not by cell) —
    the hint must not lie. Measured cost is the serial reduce loop
    (~1.1 ns per lane*channel) either way."""
    return jax.ops.segment_max(vals, keys, num_segments=n_rows,
                               indices_are_sorted=sorted)


def _prev(x: jnp.ndarray, fill) -> jnp.ndarray:
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def use_scatter_landing(impl: str, n_rows: int) -> bool:
    """Scatter landing mode (hotsketch.sketch_insert): update the
    [S, C] cell arrays with per-touched-cell scatters instead of
    landing + merging [S, C]-shaped intermediates. Bit-identical
    semantics (tests/test_sketch.py::TestLandImplEquivalence) but
    MEASURED SLOWER on chip at CriteoTB sizes (sketch+migration 6.24 ms
    vs the landing path's 4.35: inside the step each .at[] scatter on a
    still-referenced [1.6M, C] array pays a full-table copy before the
    serial per-lane update, where the landing path's where-merges fuse
    the copy with the update) — so 'auto' never selects it; it stays a
    selectable arm for A/B and for shapes where the trade may flip."""
    return impl == "scatter"


def land_max(enc: jnp.ndarray, sorted_keys: jnp.ndarray, n_rows: int,
             impl: str = "segmax") -> jnp.ndarray:
    """Segment-max landing for (-1)-encoded single-writer payloads:
    enc [B, C] int32 (>= 0 on at most one lane per (segment, channel),
    -1 elsewhere), sorted_keys [B] (>= n_rows dropped) -> [B-free]
    [n_rows, C] with -1 where no writer. Three interchangeable
    implementations for the insert's one B-lane landing (the costliest
    op in the sketch insert; A/B'd on chip, tools/ab_insert_land.py):

    * 'segmax'   jax.ops.segment_max — XLA's serial per-lane reduce loop
                 (~1.1 ns per lane*channel).
    * 'segsum1'  segment_sum of (enc + 1): the single-writer invariant
                 makes sum == the writer's payload + 1; 0 == no writer.
                 Same loop, measured cheaper per channel.
    * 'scan'     segmented cummax via one log-depth associative scan +
                 a per-row gather of each segment's END lane — fully
                 vectorized, no serial reduce at all. Segment end lanes
                 come from a 1-channel histogram cumsum.
    * 'pallas'   ops/pallas_land.py — flagged lane-scan + MXU one-hot
                 landing in one kernel, VMEM-resident output. TPU only,
                 n_rows <= pallas_land.MAX_ROWS; other configs fall
                 back to 'segmax'.
    * 'auto'     'pallas' where available, else 'segmax'.
    """
    if impl in ("pallas", "auto"):
        from .pallas_land import MAX_LANES, MAX_ROWS, pallas_land_max_t
        if n_rows <= MAX_ROWS and enc.shape[0] <= MAX_LANES \
                and _on_tpu():
            return pallas_land_max_t(enc.T, sorted_keys, n_rows).T
        impl = "segmax"
    if impl == "segmax":
        # clamp empty segments (INT_MIN) to -1 so every impl returns the
        # same encoding (consumers only test >= 0; fused, free)
        return jnp.maximum(seg_max(enc, sorted_keys, n_rows), -1)
    if impl == "segsum1":
        s = jax.ops.segment_sum(enc + 1, sorted_keys, num_segments=n_rows,
                                indices_are_sorted=True)
        return s - 1
    # 'scan': inclusive segmented cummax over the sorted lanes
    head = (sorted_keys != _prev(sorted_keys, -1))[:, None]

    def comb(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.maximum(av, bv))

    _, scanned = jax.lax.associative_scan(comb, (head, enc), axis=0)
    ones = (sorted_keys < n_rows).astype(jnp.int32)
    cnt = jax.ops.segment_sum(ones, sorted_keys, num_segments=n_rows,
                              indices_are_sorted=True)
    ends = jnp.cumsum(cnt) - 1                       # [n_rows]
    mx = scanned[jnp.clip(ends, 0, enc.shape[0] - 1)]
    return jnp.where((cnt > 0)[:, None], mx, -1)


def set_rows_max(dest: jnp.ndarray, payload_enc: jnp.ndarray,
                 sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Scatter-set `dest[k[i], c] = payload` for writes with AT MOST ONE
    non-negative contributor per destination element, scatter-free:
    payload_enc [B, C] carries the payload on contributor lanes and -1
    elsewhere; the segment max recovers exactly the contributor's value
    (payloads must be >= 0). dest [R, C]."""
    mx = seg_max(payload_enc, sorted_keys, dest.shape[0])
    return jnp.where(mx >= 0, mx.astype(dest.dtype), dest)


def compact_mask(mask: jnp.ndarray, k: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane positions of the first k True lanes of `mask` [B], in lane
    order: returns (pos [k] int32, valid [k] bool) via one stable
    argsort (~50 us at 53k lanes in-context — cheaper than both a
    53k-lane scatter compaction and a searchsorted binary search)."""
    pos = jnp.argsort(~mask, stable=True)[:k].astype(jnp.int32)
    return pos, mask[pos]


# Use the table-pass apply when the table has at most this many rows per
# update lane: the pass streams ~3-4 table-sized arrays at HBM bandwidth
# while the scatter's serial loop burns ~7 ns of memory latency per lane
# (~50x HBM row-throughput at dim 16), so break-even is near 30x; 8x
# keeps a wide safety margin for the extra sort/segment work.
PASS_ROW_FACTOR = 8


def use_table_pass(n_rows: int, n_lanes: int) -> bool:
    return n_rows <= PASS_ROW_FACTOR * n_lanes


def apply_rows_pass(table: jnp.ndarray, slots: dict, idx: jnp.ndarray,
                    grad: jnp.ndarray, lr: float, optimizer: str):
    """Sparse optimizer apply as a full-table pass (math of
    ops.sparse.apply_rows: duplicates coalesce first, then one
    sgd/adagrad/adam row step). idx [B] int32 (out-of-range = dropped
    lanes), grad [B, D]. Returns (table, slots).

    sgd/adagrad need no touched-row mask: a coalesced grad of exactly 0
    (untouched rows — segment_sum of an empty segment) produces exactly
    a zero update and zero acc growth, elementwise. Adam masks m/v decay
    to touched rows (ops/sparse.py lazy-Adam semantics)."""
    n = table.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    sgrad = grad[order]
    g = seg_sum(sgrad, sidx, n)  # [N, D] coalesced grads; 0 if untouched

    if optimizer == "adagrad":
        acc = slots["acc"] + g * g
        std = jnp.sqrt(acc) + 1e-10
        table = table + (-lr * g / std).astype(table.dtype)
        return table, {"acc": acc}
    if optimizer == "adam":
        touched = seg_max(jnp.ones_like(sidx), sidx, n) > 0
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
