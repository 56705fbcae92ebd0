"""Pallas TPU kernel: dense per-row gradient sums over SORTED row keys
— the SGD sparse apply for VMEM-class tables.

Why it exists: XLA's scatter-add runs a serial per-lane read-modify-
write loop at ~8 ns/lane for dim-16 rows (~420 us at the bench's 53k
lanes — the single largest line of the dim-16 step profile,
docs/r5_measurements/profile_train_r5.txt), while this chip's measured
primitive costs (docs/PERF.md) put MXU one-hot reductions orders of
magnitude below per-lane loops. When the whole [N, D] table fits VMEM
there is no reason to scatter at all: accumulate a DENSE [D, N] update
and add it to the table in one fused elementwise pass.

Design (single grid step, same skeleton as ops/pallas_land.py):

* the caller sorts the row keys (one lax.sort) and permutes the
  updates to match — sorted keys give each lane tile a contiguous
  landing-window range;
* an in-kernel fori over lane tiles: one-hot [W, tb] selection of
  lanes by destination row rides the MXU against the update tile
  ([D, tb] f32, Precision.HIGHEST) — duplicate rows SUM inside the
  matmul, so no segmented scan and no carry are needed; window
  accumulation handles rows spanning tile boundaries;
* the [D, N] accumulator stays VMEM-resident across the whole batch
  and flushes once.

Float semantics: sums reassociate (per-window matmul order) relative
to XLA's sequential scatter — standard f32 reduction tolerance, exact
for the common single-contributor rows.

Reference counterpart: torch's sparse SGD step (the same role as
ops/pallas_apply.py, which covers the HBM-class tables this kernel
cannot hold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 512             # lanes per tile == landing-window rows
MAX_OUT_BYTES = 6 << 20   # [D, N] f32 VMEM accumulator cap
MAX_LANES = 262144


def _rowsum_kernel(n_rows: int, tb: int, bp: int,
                   keys_ref, g_ref, out_ref):
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 0)

    def tile_body(j, _):
        t0 = j * tb
        tkeys = keys_ref[:, pl.ds(t0, tb)]        # [1, tb]
        g = g_ref[:, pl.ds(t0, tb)]               # [D, tb]
        valid = tkeys < n_rows
        k_min = tkeys[0, 0]
        k_max = jnp.max(jnp.where(valid, tkeys, 0))
        any_valid = k_min < n_rows

        def window_body(w):
            w0 = w * tb
            eq2 = ((tkeys - w0) == rows_iota) & valid     # [W, tb]
            blk = jax.lax.dot_general(
                g, eq2.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [D, W]
            cur = out_ref[:, pl.ds(w0, tb)]
            out_ref[:, pl.ds(w0, tb)] = cur + blk
            return w + 1

        @pl.when(any_valid)
        def _():
            jax.lax.while_loop(lambda w: w * tb <= k_max, window_body,
                               k_min // tb)
        return 0

    jax.lax.fori_loop(0, bp // tb, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "tb"))
def pallas_rowsum_t(gT: jnp.ndarray, sorted_keys: jnp.ndarray,
                    n_rows: int, tb: int = TB) -> jnp.ndarray:
    """gT [D, B] f32 updates in SORTED-key lane order; sorted_keys [B]
    int32 ascending (>= n_rows dropped) -> dense [D, n_rows] per-row
    sums."""
    d, b = gT.shape
    bp = ((b + tb - 1) // tb) * tb
    if bp != b:
        sorted_keys = jnp.concatenate(
            [sorted_keys, jnp.full((bp - b,), n_rows, sorted_keys.dtype)])
        gT = jnp.concatenate(
            [gT, jnp.zeros((d, bp - b), gT.dtype)], axis=1)
    sp = ((n_rows + tb - 1) // tb) * tb + tb      # window overrun room
    keys = jnp.minimum(sorted_keys.astype(jnp.int32), sp - tb)

    out = pl.pallas_call(
        functools.partial(_rowsum_kernel, n_rows, tb, bp),
        out_shape=jax.ShapeDtypeStruct((d, sp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(keys[None, :], gT.astype(jnp.float32))
    return out[:, :n_rows]


def sparse_add_dense(table: jnp.ndarray, idx: jnp.ndarray,
                     upd: jnp.ndarray) -> jnp.ndarray:
    """table[idx] += upd via the dense row-sum kernel: sort lanes by
    row, permute updates, accumulate [D, N] on the MXU, one fused add.
    table [N, D]; idx [B] int32 (out-of-range = dropped); upd [B, D]."""
    n, d = table.shape
    b = idx.shape[0]
    safe = jnp.where((idx >= 0) & (idx < n), idx.astype(jnp.int32), n)
    order = jnp.argsort(safe).astype(jnp.int32)
    sk = safe[order]
    gT = upd[order].T                             # [D, B]
    acc = pallas_rowsum_t(gT, sk, n)
    return table + acc.T.astype(table.dtype)
