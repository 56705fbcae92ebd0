"""Sparse (scatter-based) embedding updates.

The reference relies on torch sparse gradients + torch.optim's sparse paths
(F.embedding_bag(sparse=True) → coalesced updates). On TPU the equivalent is
dedup-first scatter: duplicate row indices in a batch are combined by a
sort + segment-sum, then a single conflict-free scatter applies the update.

Row index convention: out-of-range (>= table rows) indices are dropped by
XLA scatter `mode="drop"`, which is how masked/padded lanes are skipped
without boolean reshuffling.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def coalesce(idx: jnp.ndarray, grad: jnp.ndarray,
             drop_sentinel: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine duplicate row indices: returns (unique_idx, summed_grad) with
    the same static length; duplicate lanes carry `drop_sentinel` as index
    (so a following scatter with mode='drop' ignores them).

    idx: int32 [B]; grad: [B, D].
    """
    order = jnp.argsort(idx)
    sidx = idx[order]
    sgrad = grad[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    seg = jnp.cumsum(head) - 1
    summed = jax.ops.segment_sum(sgrad, seg, num_segments=idx.shape[0])
    # place each group's sum at its head lane
    out_grad = summed[seg] * head[:, None]
    out_idx = jnp.where(head, sidx, drop_sentinel)
    return out_idx, out_grad


def unique_compact(idx: jnp.ndarray, capacity: int, drop_sentinel: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact the distinct values of idx [M] into a fixed [capacity]
    buffer (sorted order, sentinel in unused lanes). Also returns
    inv [M] — each lane's position in the compact buffer (valid only when
    n_unique <= capacity) — and n_unique. The capacity-bounded exchange
    uses this to ship C instead of M ids when the batch is skewed."""
    m = idx.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    seg = jnp.cumsum(head) - 1
    uids = jnp.full((capacity,), drop_sentinel, idx.dtype).at[
        jnp.where(head, seg, capacity)].set(sidx, mode="drop")
    inv = jnp.zeros((m,), seg.dtype).at[order].set(seg)
    return uids, inv, seg[-1] + 1


def coalesce_compact(idx: jnp.ndarray, grad: jnp.ndarray, capacity: int,
                     drop_sentinel: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """coalesce() variant that compacts the unique groups into a fixed
    [capacity] buffer: (cidx [C], cgrad [C, D], n_unique). Groups beyond
    capacity are DROPPED — callers must check n_unique <= capacity and
    fall back to the full-size path (see exchange.sharded_apply)."""
    order = jnp.argsort(idx)
    sidx = idx[order]
    sgrad = grad[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    seg = jnp.cumsum(head) - 1
    cgrad = jax.ops.segment_sum(sgrad, seg, num_segments=capacity)
    cidx = jnp.full((capacity,), drop_sentinel, idx.dtype).at[
        jnp.where(head, seg, capacity)].set(sidx, mode="drop")
    return cidx, cgrad, seg[-1] + 1


def sparse_sgd(table: jnp.ndarray, idx: jnp.ndarray, grad: jnp.ndarray,
               lr: float) -> jnp.ndarray:
    """SGD scatter update; duplicate indices sum naturally (== torch's
    coalesced sparse SGD)."""
    return table.at[idx].add((-lr * grad).astype(table.dtype), mode="drop")


def sparse_adagrad(table: jnp.ndarray, acc: jnp.ndarray, idx: jnp.ndarray,
                   grad: jnp.ndarray, lr: float, eps: float = 1e-10
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adagrad with torch semantics: coalesce duplicates first, then
    acc += g²  and  row -= lr * g / (sqrt(acc) + eps). The accumulator is
    per-ELEMENT (acc has the table's shape — what _maybe_acc constructs)."""
    uidx, ugrad = coalesce(idx, grad, drop_sentinel=table.shape[0])
    acc = acc.at[uidx].add(ugrad * ugrad, mode="drop")
    std = jnp.sqrt(acc[jnp.clip(uidx, 0, acc.shape[0] - 1)]) + eps
    table = table.at[uidx].add((-lr * ugrad / std).astype(table.dtype),
                               mode="drop")
    return table, acc


def sparse_adam(table: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                t: jnp.ndarray, idx: jnp.ndarray, grad: jnp.ndarray,
                lr: float, beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-8):
    """Rows-Adam ("lazy" Adam): first/second moments advance only for rows
    touched this step; bias correction uses the table-global step count.

    This is the sparse-friendly analogue of the reference graphrec's
    torch.optim.Adam (TOIS_revision/PinSAGE/model.py:133,
    LightGCN/code/utils.py:39): dense Adam would sweep/decay every vocab
    row's moments each step — an O(vocab) pass the O(batch) update
    contract forbids. On rows that ARE touched the math is exactly Adam's.
    Returns (table, m, v, t)."""
    uidx, ugrad = coalesce(idx, grad, drop_sentinel=table.shape[0])
    t = t + 1
    safe = jnp.clip(uidx, 0, table.shape[0] - 1)
    m_rows = beta1 * m[safe] + (1.0 - beta1) * ugrad
    v_rows = beta2 * v[safe] + (1.0 - beta2) * (ugrad * ugrad)
    m = m.at[uidx].set(m_rows, mode="drop")
    v = v.at[uidx].set(v_rows, mode="drop")
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** tf
    bc2 = 1.0 - beta2 ** tf
    upd = lr * (m_rows / bc1) / (jnp.sqrt(v_rows / bc2) + eps)
    table = table.at[uidx].add(-upd.astype(table.dtype), mode="drop")
    return table, m, v, t


# optimizer -> {slot name -> state-key suffix}; the shared vocabulary for
# Part state dicts ("table_acc", "table_m", ...) and the sharded exchange
SLOT_SUFFIXES = {
    "sgd": {},
    "adagrad": {"acc": "_acc"},
    "adam": {"m": "_m", "v": "_v", "t": "_t"},
}


def init_slots(table: jnp.ndarray, optimizer: str) -> dict:
    """Fresh optimizer-slot dict for `table` (keys are slot NAMES, not
    state keys): {} sgd, {acc} adagrad, {m, v, t} adam."""
    if optimizer == "adagrad":
        return {"acc": jnp.zeros_like(table)}
    if optimizer == "adam":
        return {"m": jnp.zeros_like(table), "v": jnp.zeros_like(table),
                "t": jnp.zeros((), jnp.int32)}
    return {}


# SGD apply into tables at least this many rows uses the pallas
# read-modify-write kernel (ops/pallas_apply.py) instead of XLA's
# scatter on the TPU backend: XLA scatter into HBM-resident tables runs
# ~180 ns/lane (9.6 ms at CriteoTB dim-128 shapes) vs the kernel's
# deep-DMA-queue RMW at the ~2x gather wall. VMEM-class tables keep the
# plain scatter (A/B: tools/ab_apply128.py). Threshold ~= rows where a
# dim-128 f32 table stops fitting VMEM-resident scatter behavior.
PALLAS_APPLY_MIN_ROWS = 1 << 20

# module-level override for A/B runs: 'auto' (rule above), 'scatter',
# 'pallas' — set by build_embedding_layer from cfg.sparse_apply_impl
# BEFORE tracing (trace-time read; documented global)
APPLY_IMPL = "auto"


PALLAS_APPLY_AUTO = True   # confirmed on chip 2026-08-20: numerics pass
                           # (max_abs_err 7.4e-6 with the HIGHEST-
                           # precision combine) and 3.11 ms vs XLA
                           # scatter's 10.17 ms (donated: 4.84 ms) at
                           # CriteoTB shapes (docs/r5_measurements/
                           # ab_apply128.txt)


def _use_pallas_apply(n_rows: int, dim: int) -> bool:
    if APPLY_IMPL == "scatter":
        return False
    if APPLY_IMPL == "pallas":
        return True
    # auto: only the chip-validated case — HBM-class table, lane-width-
    # aligned rows (dim 16 rows fail Mosaic's DMA lowering; they never
    # qualify anyway under the row threshold in practice)
    if not PALLAS_APPLY_AUTO or n_rows < PALLAS_APPLY_MIN_ROWS \
            or dim % 128 != 0:
        return False
    return _on_tpu()


def _use_dense_rowsum(n_rows: int, dim: int, lanes: int) -> bool:
    """VMEM-class SGD apply via the dense MXU row-sum kernel
    (ops/pallas_rowsum.py). The KERNEL beats the scatter loop (~162 vs
    ~419 us at bench shapes) but the full path LOSES in-step: the
    per-call sort + permutation gather + [B, D] -> [D, B] transpose it
    needs are loop-invariant in a standalone A/B (XLA hoists them — a
    measurement trap) and cost more than the scatter saves when paid
    every step (BENCH with it auto-wired: 970 K vs 1,179 K ex/s).
    Explicit opt-in only (sparse_apply_impl='dense') for workloads
    whose update stream arrives pre-sorted."""
    if APPLY_IMPL != "dense":
        return False
    from .pallas_rowsum import MAX_LANES, MAX_OUT_BYTES
    if dim % 8 != 0 or n_rows * dim * 4 > MAX_OUT_BYTES \
            or lanes > MAX_LANES or dim * lanes * 4 > (8 << 20):
        return False
    return _on_tpu()


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def apply_rows(table: jnp.ndarray, slots: dict, idx: jnp.ndarray,
               grad: jnp.ndarray, lr: float, optimizer: str,
               table_pass: bool | None = None):
    """Unified sparse row update: dispatch on optimizer with `slots` as
    produced by init_slots. Returns (table, slots).

    Route choice (in-step A/B on v5e, bench shapes 53k lanes x 16,
    docs/r4_measurements/): plain scatter-add costs ~340 us and SGD
    needs nothing else (duplicates sum natively), while the sorted pass
    (argsort + permute-gathers + multi-channel segment_sum) costs ~1.0 ms
    — so SGD always scatters. Adagrad/adam must coalesce duplicates
    FIRST (torch semantics) and then pay several scatters/gathers, which
    loses to the pass whenever the table is small enough to stream
    (use_table_pass); big tables scatter either way. SGD into HBM-class
    tables (>= PALLAS_APPLY_MIN_ROWS rows, TPU backend) routes to the
    pallas RMW kernel instead of XLA's serialized scatter."""
    if optimizer == "sgd" and _use_pallas_apply(*table.shape):
        from .pallas_apply import pallas_scatter_add
        upd = (-lr * grad).astype(table.dtype)
        return pallas_scatter_add(table, idx, upd), {}
    if optimizer == "sgd" and _use_dense_rowsum(*table.shape,
                                                idx.shape[0]):
        from .pallas_rowsum import sparse_add_dense
        return sparse_add_dense(table, idx, -lr * grad), {}
    if table_pass is None:
        if optimizer == "sgd":
            table_pass = False
        else:
            from .sorted_update import use_table_pass
            table_pass = use_table_pass(table.shape[0], idx.shape[0])
    if table_pass:
        from .sorted_update import apply_rows_pass
        return apply_rows_pass(table, slots, idx, grad, lr, optimizer)
    if optimizer == "adagrad":
        table, acc = sparse_adagrad(table, slots["acc"], idx, grad, lr)
        return table, {"acc": acc}
    if optimizer == "adam":
        table, m, v, t = sparse_adam(table, slots["m"], slots["v"],
                                     slots["t"], idx, grad, lr)
        return table, {"m": m, "v": v, "t": t}
    return sparse_sgd(table, idx, grad, lr), {}


def segment_rows(values: jnp.ndarray, seg_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)
