"""pallas_scatter_add (in-place sparse row update) vs numpy oracle.

Interpret mode on CPU — the kernel's DMA queue, duplicate-combining
equality matmul, and drop-lane masking run under the pallas TPU
interpreter (same strategy as tests/test_pallas_a2a.py). The
interpreter does NOT alias the input/output buffers, so duplicates are
kept WITHIN a lane tile here; the cross-tile-duplicate leg (which rides
input_output_aliases + sequential grid ordering) is validated COMPILED
on the real chip by tools/ab_apply128.py's numerics gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cafe_tpu.ops.pallas_apply import pallas_scatter_add


def _oracle(table, ids, upd):
    want = table.copy()
    m = ids < table.shape[0]
    np.add.at(want, ids[m], upd[m])
    return want


def _tile_local_ids(rng, n, b, tile):
    """Random ids with duplicates allowed only within a tile: tile t
    draws from its own disjoint row range."""
    nt = b // tile
    ids = np.empty(b, np.int32)
    per = n // nt
    for t in range(nt):
        ids[t * tile:(t + 1) * tile] = rng.integers(
            t * per, (t + 1) * per, tile)
    return ids


@pytest.mark.parametrize("n,d,b,tile", [
    (512, 128, 1024, 256),   # tile-divisible, in-tile duplicates
    (512, 64, 768, 256),     # drop + padding lanes
    (128, 128, 512, 128),    # small table, heavy in-tile duplicates
])
@pytest.mark.timeout(600)
def test_matches_oracle(n, d, b, tile):
    rng = np.random.default_rng(0)
    table = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = _tile_local_ids(rng, n, b, tile)
    upd = rng.normal(0, 0.1, (b, d)).astype(np.float32)
    got = np.asarray(pallas_scatter_add(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
        tile=tile, interpret=True))
    np.testing.assert_allclose(got, _oracle(table, ids, upd),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.timeout(600)
def test_drop_lanes_and_in_tile_duplicates():
    rng = np.random.default_rng(1)
    n, d, b, tile = 256, 128, 512, 512  # one tile: every dup is in-tile
    table = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = np.full(b, 7, np.int32)          # one row takes every lane
    ids[::5] = n + 100                     # interleaved dropped lanes
    ids[1::7] = -3                         # negative = dropped too
    upd = rng.normal(0, 0.1, (b, d)).astype(np.float32)
    got = np.asarray(pallas_scatter_add(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
        tile=tile, interpret=True))
    want = table.copy()
    m = (ids >= 0) & (ids < n)
    np.add.at(want, ids[m], upd[m])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.timeout(600)
def test_disjoint_rows_across_tiles():
    # rows touched by different tiles must not interfere
    rng = np.random.default_rng(2)
    n, d, b, tile = 1024, 128, 1024, 256
    table = np.zeros((n, d), np.float32)
    ids = rng.permutation(n)[:b].astype(np.int32)   # all distinct
    upd = np.ones((b, d), np.float32)
    got = np.asarray(pallas_scatter_add(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(upd),
        tile=tile, interpret=True))
    np.testing.assert_allclose(got, _oracle(table, ids, upd))
