"""Pallas TPU kernel: in-place sparse row update (scatter-add) for
HBM-resident embedding tables.

Why it exists: XLA's scatter-add into a table that exceeds VMEM runs a
serialized read-modify-write loop measured at ~180 ns/lane at CriteoTB
shapes (53k lanes x dim-128 rows into a 3.4M-row table ~ 9.6 ms/step,
docs/r4_measurements/step_breakdown_128.txt) while XLA's GATHER of the
same rows runs at the ~15 ns/row random-row latency wall
(ops/pallas_gather.py header). This kernel drives the update at the
gather wall from both directions: a deep queue of per-row read DMAs,
a vectorized combine, and a deep queue of per-row write DMAs.

Duplicate-safety without sort/coalesce (the torch-style coalesce is a
[B, D] segment_sum — linear in channels, ~4 ms at dim 128):

* WITHIN a lane tile, duplicates combine with an equality matmul:
  eq[i, j] = (ids[i] == ids[j]); acc = eq @ upd gives every lane its
  duplicate-group sum (256 x 256 x D MXU work per tile — microseconds),
  and only each group's FIRST in-tile lane writes its row.
* ACROSS tiles, TPU grid steps execute sequentially on the core and
  every tile waits for its writes before the next tile's reads are
  issued, so cross-tile duplicates are ordered read-modify-writes —
  plain addition, any interleaving of disjoint groups is commutative.
  This leg depends on input_output_aliases making reads of the input
  ref observe earlier tiles' writes (same physical buffer). The pallas
  INTERPRETER does not alias the buffers, so cross-tile duplicates are
  wrong under interpret=True; tests/test_pallas_apply.py therefore
  constrains duplicates to within a tile, and the COMPILED cross-tile
  case is gated on-chip by tools/ab_apply128.py's numerics check
  (heavy duplicate groups spanning many tiles; hard-fails the tool).

The table is updated IN PLACE via input_output_aliases — no O(table)
copy per step (the un-donated XLA scatter pays one).

Semantics: table[ids[k]] += upd[k] for every k with ids[k] < N
(ids >= N are dropped lanes — same contract as XLA scatter
mode='drop'); equal to ops.sparse.sparse_sgd with upd = -lr * grad.

Reference counterpart: torch's sparse optimizer step on CUDA
(ArtifactEvaluation/main.py:377); this is its TPU-native form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256


def _apply_kernel(tile: int, n_rows: int, ids_smem, ids_row, ids_col,
                  table_hbm, upd_ref, out_hbm, scratch, sems):
    """One grid step: read `tile` rows, add duplicate-combined updates,
    write back. out_hbm aliases table_hbm (in-place)."""
    t = pl.program_id(0)

    # deep queue of per-row reads (random rows are latency-bound; queue
    # depth is the only lever — ops/pallas_gather.py)
    for i in range(tile):
        rid = ids_smem[t * tile + i]

        @pl.when(rid < n_rows)
        def _():
            pltpu.make_async_copy(table_hbm.at[rid], scratch.at[i],
                                  sems.at[i]).start()
    for i in range(tile):
        rid = ids_smem[t * tile + i]

        @pl.when(rid < n_rows)
        def _():
            pltpu.make_async_copy(table_hbm.at[rid], scratch.at[i],
                                  sems.at[i]).wait()

    # in-tile duplicate combine: group-sum via equality matmul (MXU),
    # first-occurrence lane carries the whole group's update. The ids
    # arrive in BOTH broadcast layouts ([1, tile] and [tile, 1]) so the
    # [tile, tile] equality needs no reshape/transpose (Mosaic's vector
    # layout inference rejects general shape casts).
    ir = ids_row[0]                                        # [1, tile]
    ic = ids_col[0]                                        # [tile, 1]
    eq = ic == ir                                          # [tile, tile]
    # precision=HIGHEST: the MXU's default f32 path truncates operands
    # to bf16 (rel err ~4e-3); summed over a 2k-lane duplicate group
    # that is a ~2e-3 absolute error on the combined update. The 3-pass
    # f32 mode on a [tile, tile, D] matmul costs microseconds.
    acc = jnp.dot(eq.astype(jnp.float32), upd_ref[0],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)     # [tile, D]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    first = jnp.min(jnp.where(eq, col, tile), axis=1,
                    keepdims=True)                         # [tile, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    # int32, not bool: Mosaic can only extract 32-bit scalars from
    # vectors (write[i, 0] below)
    write = ((first == iota) & (ic < n_rows)).astype(jnp.int32)
    scratch[:] = scratch[:] + acc.astype(scratch.dtype)

    # deep queue of per-row writes; waits mirror the starts exactly
    # the write phase REUSES the read semaphores (every read slot was
    # waited above, so each sem is idle) — the chip's sync-flag space is
    # ~2 KB and two per-lane arrays at tile 256 overflow it
    for i in range(tile):
        @pl.when(write[i, 0] == 1)
        def _():
            pltpu.make_async_copy(scratch.at[i],
                                  out_hbm.at[ids_smem[t * tile + i]],
                                  sems.at[i]).start()
    for i in range(tile):
        @pl.when(write[i, 0] == 1)
        def _():
            pltpu.make_async_copy(scratch.at[i],
                                  out_hbm.at[ids_smem[t * tile + i]],
                                  sems.at[i]).wait()


@functools.partial(jax.jit, static_argnames=("tile", "interpret"),
                   donate_argnums=(0,))
def pallas_scatter_add(table: jnp.ndarray, ids: jnp.ndarray,
                       upd: jnp.ndarray, tile: int = _TILE,
                       interpret: bool = False) -> jnp.ndarray:
    """table[ids] += upd, in place. table [N, D]; ids [B] int32 (>= N =
    dropped); upd [B, D]. B is padded to a tile multiple (padding lanes
    carry id = N, upd = 0)."""
    n, d = table.shape
    b = ids.shape[0]
    bp = ((b + tile - 1) // tile) * tile
    if bp != b:
        ids = jnp.concatenate(
            [ids, jnp.full((bp - b,), n, ids.dtype)])
        upd = jnp.concatenate(
            [upd, jnp.zeros((bp - b, d), upd.dtype)])
    ids = ids.astype(jnp.int32)
    ids = jnp.where(ids < 0, n, ids)   # scatter 'drop' semantics for < 0
    # Mosaic block rule: a VMEM block's last two dims must divide
    # (8, 128) or EQUAL the array's trailing dims — ship the ids in both
    # broadcast layouts with size-1 trailing/leading dims (blocks equal
    # the trailing dims exactly, and the kernel needs both for the
    # reshape-free equality matrix)
    ids_row = ids.reshape(bp // tile, 1, tile)
    ids_col = ids.reshape(bp // tile, tile, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # ids [1, tile]
            pl.BlockSpec((1, tile, 1), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # ids [tile, 1]
            pl.BlockSpec(memory_space=pl.ANY),          # table (HBM)
            pl.BlockSpec((1, tile, d), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # upd tiles
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # aliases table
        scratch_shapes=[
            pltpu.VMEM((tile, d), table.dtype),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_apply_kernel, tile, n),
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},   # table buffer updated in place
        # (aliases index into the flat inputs INCLUDING the scalar-
        # prefetch arg: 0 = ids scalar, 1 = ids_row, 2 = ids_col,
        # 3 = table)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids, ids_row, ids_col, table,
      upd.reshape(bp // tile, tile, d).astype(table.dtype))
