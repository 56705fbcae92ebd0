"""Pallas TPU kernel: segmented max over SORTED keys — the sketch
insert's landing reduction (ops/sorted_update.land_max impl='pallas').

Why it exists: XLA lowers jax.ops.segment_max / segment_sum to a serial
per-lane reduce loop (~1.1 ns per lane x channel — docs/PERF.md;
[53k, 8] costs ~430-480 us, tools/profile_insert.txt), which makes the
landing THE largest line item of the sketch insert. With the keys
already sorted (the insert sorts by (bucket, id) anyway) the reduction
is computable at VMEM/VPU speed.

Design (single grid step — measured: a 104-step grid pays ~4.8 us of
per-step pipeline overhead on this chip, ~500 us of pure streaming
overhead for 1 MB of input; one step with the whole batch VMEM-resident
pays it once):

* GLOBAL flagged max-scan over the full [C, B] payload: log2(B) steps
  of hardware lane rotate (pltpu.roll) + select; head flags stop the
  running max at segment starts. ~4 vector passes per step over ~1 MB
  — tens of microseconds total;
* the scanned values and end-lane flags park in VMEM scratch so the
  landing loop can re-slice them at dynamic (but provably tb-aligned)
  offsets — Mosaic supports dynamic slicing on REFS, not values;
* landing: an in-kernel fori over lane tiles; for each tile, a one-hot
  [W, tb] selection of segment-END lanes by destination row rides the
  MXU against the scanned values split into exact 16-bit halves
  (each output row receives exactly ONE lane's halves, so hi/lo
  recombine losslessly; Precision.HIGHEST keeps the halves exact
  through the MXU). A tile's keys may span several W-row windows
  (sparse buckets): an inner while loop walks them — total windows
  <= tiles + S/W;
* values land q-ENCODED (q = enc + 1, so q == 0 means "no writer"):
  writer-less rows come out of the matmul as 0, decode to -1, and
  row-merges use max, so partial/overlapping window writes are safe;
* everything lives LANE-MINOR ([C, B] / [C, S]): a [S, C] int32 array
  in VMEM pads C up to the 128-lane tile (25x waste at C=5) while
  [C, S] is dense.

Capacity: B x (C+1) x 4 B of payload plus the [C, S] output and one
scanned copy must fit VMEM — MAX_LANES / MAX_ROWS gate it; other
configs fall back to the XLA path (ops/sorted_update.land_max).

Semantics (identical to land_max/'segmax'): enc [B, C] int32 >= -1,
keys [B] int32 ascending with >= n_rows meaning dropped; returns
[n_rows, C] segment max with -1 where a segment has no writer. Max is
exact for MULTIPLE writers per (segment, channel) — the hi/lo split
happens after the int32 scan, not before. Payloads must stay <= 2^30
(headroom for the q encoding; the insert's count bits and packed
(cell, id) encodings both satisfy it, hotsketch.py:415).

Reference counterpart: the sketch insert's per-id sequential bucket
update loop (ArtifactEvaluation/embeddings/sketch.cpp:142-150); this is
the batch-parallel landing step of its TPU-native form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 512            # landing-window rows W == lanes per landing tile
MAX_ROWS = 131072   # [C, S] VMEM-resident output cap (8ch x 131k x 4 B
#                     ~ 4 MB; oracle-validated on chip at 65k and 131k)
MAX_LANES = 262144  # [C, B] payload + scanned copy VMEM cap


def _shift_right(x, d, fill):
    """Along the LAST axis: y[..., i] = x[..., i-d], first d = fill.
    Built on pltpu.roll (a hardware lane rotate): jnp.roll / slice
    concatenation lowers to misaligned tpu.concatenate, which Mosaic
    rejects ("input offsets outside of the first tile")."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx < d, jnp.asarray(fill, x.dtype),
                     pltpu.roll(x, d, x.ndim - 1))


def _land_kernel(n_rows: int, n_ch: int, tb: int, bp: int,
                 keys_ref, q_ref, out_ref, sv_ref, end_ref):
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    keys = keys_ref[:]                            # [1, B] int32, sorted
    v = q_ref[:]                                  # [C, B] int32 >= 0

    # GLOBAL flagged inclusive max-scan along all B lanes: f marks "a
    # segment head lies within the last 2^step lanes" — once f is set
    # the running max must not absorb earlier lanes. Flags ride int32.
    prev_keys = _shift_right(keys, 1, -1)
    f = (keys != prev_keys).astype(jnp.int32)     # [1, B]; lane 0: 1
    d = 1
    while d < bp:
        pf = _shift_right(f, d, 1)
        pv = _shift_right(v, d, 0)
        v = jnp.where(f != 0, v, jnp.maximum(v, pv))
        f = f | pf
        d *= 2
    # v[:, l] = inclusive max of lane l's whole segment

    # segment END lanes (the last lane of the batch is always an end)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, bp), 1)
    next_keys = jnp.where(lane_idx == bp - 1, -1,
                          pltpu.roll(keys, bp - 1, 1))    # keys[l+1]
    ender = ((keys != next_keys) & (keys < n_rows)).astype(jnp.int32)

    # park scanned values + flags in scratch: the landing loop slices
    # them at dynamic offsets, which Mosaic allows on refs only
    sv_ref[:n_ch] = (v >> 16)
    sv_ref[n_ch:] = (v & 0xFFFF)
    end_ref[:] = ender

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 0)

    def tile_body(j, _):
        t0 = j * tb
        tkeys = keys_ref[:, pl.ds(t0, tb)]                # [1, tb]
        halves = sv_ref[:, pl.ds(t0, tb)].astype(jnp.float32)
        tend = end_ref[:, pl.ds(t0, tb)] != 0             # [1, tb]
        k_min = tkeys[0, 0]
        k_max = jnp.max(jnp.where(tkeys < n_rows, tkeys, 0))
        any_valid = k_min < n_rows                 # sorted: lane 0 first

        def window_body(w):
            w0 = w * tb
            # eq2[r, l] = lane l lands row w0 + r; contraction over the
            # LANE dim on both operands (no transposes)
            eq2 = ((tkeys - w0) == rows_iota) & tend      # [W, tb]
            blk = jax.lax.dot_general(
                halves, eq2.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [2C, W]
            bi = (blk[:n_ch].astype(jnp.int32) << 16) | \
                blk[n_ch:].astype(jnp.int32)              # [C, W] exact
            cur = out_ref[:, pl.ds(w0, tb)]
            out_ref[:, pl.ds(w0, tb)] = jnp.maximum(cur, bi)
            return w + 1

        @pl.when(any_valid)
        def _():
            jax.lax.while_loop(lambda w: w * tb <= k_max, window_body,
                               k_min // tb)
        return 0

    jax.lax.fori_loop(0, bp // tb, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret", "tb"))
def pallas_land_max_t(encT: jnp.ndarray, keys: jnp.ndarray, n_rows: int,
                      interpret: bool = False, tb: int = TB
                      ) -> jnp.ndarray:
    """Transposed-layout entry: encT [C, B], sorted keys [B] ->
    [C, n_rows] segment max (-1 = no writer). See module docstring."""
    c, b = encT.shape
    bp = ((b + tb - 1) // tb) * tb
    if bp != b:
        keys = jnp.concatenate(
            [keys, jnp.full((bp - b,), n_rows, keys.dtype)])
        encT = jnp.concatenate(
            [encT, jnp.full((c, bp - b), -1, encT.dtype)], axis=1)
    sp = ((n_rows + tb - 1) // tb) * tb + tb      # window overrun room
    keys = jnp.minimum(keys.astype(jnp.int32), sp - tb)  # never past pad
    q = encT.astype(jnp.int32) + 1

    out = pl.pallas_call(
        functools.partial(_land_kernel, n_rows, c, tb, bp),
        out_shape=jax.ShapeDtypeStruct((c, sp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # keys [1, B]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # q [C, B]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * c, bp), jnp.int32),       # 16-bit halves
            pltpu.VMEM((1, bp), jnp.int32),           # end flags
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(keys[None, :], q)
    return out[:, :n_rows] - 1


def pallas_land_max(enc: jnp.ndarray, keys: jnp.ndarray, n_rows: int,
                    interpret: bool = False, tb: int = TB) -> jnp.ndarray:
    """[B, C]-layout wrapper matching land_max's signature: returns
    [n_rows, C]."""
    return pallas_land_max_t(enc.T, keys, n_rows, interpret, tb).T
