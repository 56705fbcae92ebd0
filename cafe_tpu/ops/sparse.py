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


def segment_rows(values: jnp.ndarray, seg_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)
