"""CU (conservative-update count-min) frequency sketch, device-resident.

Reference: the CUsketch class embedded in AE embeddings/sketch.cpp:153-205
and sketch_expr/sketchtest.cpp:159-211 — k hash rows of n counters,
multiplicative hashing, used for frequency-estimation experiments (exposed
as batch_cnt; not on the training path).

This implementation uses the textbook conservative update — every row's
counter rises to max(counter, min_estimate + value) — which dominates the
reference's only-update-the-min-row variant in accuracy; queries are
min-over-rows either way.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([2654435761, 2246822519, 3266489917, 668265263,
                    374761393, 2853776293, 1540483477, 2447445653],
                   dtype=np.uint32)


class CUSketchConfig(NamedTuple):
    rows: int      # k hash rows
    width: int     # n counters per row


class CUSketchState(NamedTuple):
    cnt: jnp.ndarray  # f32 [k, width]


def init_cu(cfg: CUSketchConfig) -> CUSketchState:
    assert cfg.rows <= len(_PRIMES)
    return CUSketchState(cnt=jnp.zeros((cfg.rows, cfg.width), jnp.float32))


def _positions(cfg: CUSketchConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """[B, k] counter positions via per-row multiplicative hashing."""
    mults = jnp.asarray(_PRIMES[: cfg.rows])
    h = ids.astype(jnp.uint32)[:, None] * mults[None, :]
    return (h % jnp.uint32(cfg.width)).astype(jnp.int32)


def cu_query(cfg: CUSketchConfig, st: CUSketchState,
             ids: jnp.ndarray) -> jnp.ndarray:
    pos = _positions(cfg, ids)                      # [B, k]
    rows = jnp.arange(cfg.rows)[None, :]
    return jnp.min(st.cnt[rows, pos], axis=1)


@jax.jit
def _insert(cnt, pos, vals):
    rows = jnp.arange(cnt.shape[0])[None, :]
    cur = cnt[rows, pos]                            # [B, k]
    mn = jnp.min(cur, axis=1, keepdims=True)
    target = mn + vals[:, None]
    # conservative update: raise each row's counter to at most target
    return cnt.at[rows, pos].max(target)


def cu_insert(cfg: CUSketchConfig, st: CUSketchState, ids: jnp.ndarray,
              vals: jnp.ndarray = None) -> CUSketchState:
    """Batched conservative-update insert. Duplicate ids within the batch
    are pre-combined (their values summed) so the update is conflict-free
    up to the scatter-max, which is order-independent."""
    if vals is None:
        vals = jnp.ones_like(ids, dtype=jnp.float32)
    order = jnp.argsort(ids)
    sid = ids[order]
    sval = vals[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head) - 1
    tot = jax.ops.segment_sum(sval, seg, num_segments=ids.shape[0])[seg]
    use = jnp.where(head, tot, 0.0)
    pos = _positions(cfg, sid)
    return CUSketchState(cnt=_insert(st.cnt, pos, use))
