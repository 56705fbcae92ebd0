"""Pallas TPU kernel: segmented max over SORTED keys — the sketch
insert's landing reduction (ops/sorted_update.land_max impl='pallas').

Why it exists: XLA lowers jax.ops.segment_max / segment_sum to a serial
per-lane reduce loop (~1.1 ns per lane x channel — docs/PERF.md;
[53k, 8] costs ~430-480 us, tools/profile_insert.txt), which makes the
landing THE largest line item of the sketch insert. With the keys
already sorted (the insert sorts by (bucket, id) anyway) the reduction
is computable at VMEM/VPU speed:

* grid over fixed lane tiles (TB); tiles run sequentially on the core,
  a (carry_key, carry_max[C]) scratch continues the segment that spans
  a tile boundary;
* within a tile, a log2(TB)-step FLAGGED max-scan (head flags stop the
  running max at segment starts) yields every lane's inclusive segment
  max — vector shifts + selects, no serial loop. Every tile's LAST lane
  lands its (possibly partial) segment max; later tiles re-land the
  same row with a larger-or-equal value (the carry accumulates and
  rows merge with max), so partial landings are safe;
* landing: one-hot [TB, W] selection of segment-END lanes by
  destination row rides the MXU as a matmul against the scanned values
  split into exact 16-bit halves (each output row receives exactly ONE
  lane's halves, so hi/lo recombine losslessly; Precision.HIGHEST keeps
  the 16-bit halves exact through the MXU);
* values land q-ENCODED (q = enc + 1, so q == 0 means "no writer"):
  writer-less rows come out of the matmul as 0 and merge as no-ops;
* everything lives LANE-MINOR ([C, B] / [C, S]): a [S, C] int32 array
  in VMEM pads C up to the 128-lane tile (25x waste at C=5) while
  [C, S] is dense. The [C, S] output stays RESIDENT in VMEM across all
  grid steps (constant out-block index), initialized once and flushed
  to HBM once — no per-tile HBM round trips. This caps S at a VMEM
  budget (MAX_ROWS); larger sketches keep the XLA path
  (ops/sorted_update.land_max falls back).

Key-range handling: a tile's keys may span more than one W-row landing
window (sparse buckets); an in-kernel while loop walks the windows
(total windows across the batch <= tiles + S/W).

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

TB = 256            # lanes per tile (and landing-window rows W == TB)
MAX_ROWS = 32768    # VMEM-resident output cap: 8ch x 33k x 4B ~ 1 MB


def _shift_right(x, d, fill):
    """Along the LAST axis: y[..., i] = x[..., i-d], first d = fill.
    Built on pltpu.roll (a hardware lane rotate): jnp.roll / slice
    concatenation lowers to misaligned tpu.concatenate, which Mosaic
    rejects ("input offsets outside of the first tile")."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx < d, jnp.asarray(fill, x.dtype),
                     pltpu.roll(x, d, x.ndim - 1))


def _land_kernel(n_rows: int, n_ch: int, tb: int,
                 keys_ref, q_ref, out_ref, carry_key, carry_q):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        carry_key[0] = -1
        carry_q[:] = jnp.zeros(carry_q.shape, carry_q.dtype)

    keys = keys_ref[:]                            # [1, TB] int32, sorted
    v = q_ref[:]                                  # [C, TB] int32 >= 0

    # fold the carried segment into lane 0 (masked max — Mosaic has no
    # dynamic_update_slice on values)
    cont = keys[0, 0] == carry_key[0]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
    v = jnp.maximum(v, jnp.where((lane_idx == 0) & cont, carry_q[:], 0))

    # FLAGGED inclusive max-scan along lanes: f marks "a segment head
    # lies within the last 2^step lanes" — once f is set the running max
    # must not absorb earlier lanes. Flags ride as int32 (Mosaic's
    # rotate/select paths want 32-bit lanes).
    prev_keys = _shift_right(keys, 1, -1)
    f = (keys != prev_keys).astype(jnp.int32)     # [1, TB]; lane 0: 1
    d = 1
    while d < tb:
        pf = _shift_right(f, d, 1)
        pv = _shift_right(v, d, 0)
        v = jnp.where(f != 0, v, jnp.maximum(v, pv))
        f = f | pf
        d *= 2
    # v[:, l] = inclusive max of lane l's segment (tile-local + carry)

    # cross-tile carry from the LAST lane (roll right 1 brings it to
    # lane 0 — an aligned slice; a [:, tb-1] lane slice is misaligned)
    carry_key[0] = keys[0, tb - 1]
    carry_q[:] = pltpu.roll(v, 1, 1)[:, 0:1]

    # segment END lanes; the tile's last lane always lands (partial
    # values merge with max — see module docstring)
    next_keys = jnp.where(lane_idx == tb - 1, -1,
                          pltpu.roll(keys, tb - 1, 1))    # keys[l+1]
    ender = (keys != next_keys) & (keys < n_rows)         # [1, TB]

    k_min = keys[0, 0]
    k_max = jnp.max(jnp.where(keys < n_rows, keys, 0))
    any_valid = keys[0, 0] < n_rows               # sorted: lane 0 first

    halves = jnp.concatenate(
        [(v >> 16).astype(jnp.float32),
         (v & 0xFFFF).astype(jnp.float32)], axis=0)      # [2C, TB]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 0)

    def window_body(j):
        # tb-ALIGNED windows (w0 = j * tb): Mosaic must statically prove
        # the out slice start is a 128-multiple — j * 256 is, an
        # arbitrary k_min is not
        w0 = j * tb
        # eq2[w, l] = lane l lands row w0 + w; both operands contract
        # over the LANE dim (no transposes — Mosaic relayouts are the
        # enemy here)
        eq2 = ((keys - w0) == rows_iota) & ender          # [W, TB]
        blk = jax.lax.dot_general(
            halves, eq2.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [2C, W]
        bi = (blk[:n_ch].astype(jnp.int32) << 16) | \
            blk[n_ch:].astype(jnp.int32)                  # [C, W] exact
        cur = out_ref[:, pl.ds(w0, tb)]
        out_ref[:, pl.ds(w0, tb)] = jnp.maximum(cur, bi)
        return j + 1

    @pl.when(any_valid)
    def _():
        jax.lax.while_loop(lambda j: j * tb <= k_max, window_body,
                           k_min // tb)


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
    n_tiles = bp // tb

    out = pl.pallas_call(
        functools.partial(_land_kernel, n_rows, c, tb),
        out_shape=jax.ShapeDtypeStruct((c, sp), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            # keys in ROW form [1, bp]: block (1, tb) with a unit
            # second-minor dim EQUAL to the array's (the (8, 128) rule
            # allows equality)
            pl.BlockSpec((1, tb), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            # column slices of the [C, B] payload — no host transpose
            pl.BlockSpec((c, tb), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, sp), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((c, 1), jnp.int32),
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(keys[None, :], q)
    return out[:, :n_rows] - 1


def pallas_land_max(enc: jnp.ndarray, keys: jnp.ndarray, n_rows: int,
                    interpret: bool = False, tb: int = TB) -> jnp.ndarray:
    """[B, C]-layout wrapper matching land_max's signature: returns
    [n_rows, C]."""
    return pallas_land_max_t(enc.T, keys, n_rows, interpret, tb).T
