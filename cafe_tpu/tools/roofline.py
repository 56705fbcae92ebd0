"""Roofline accounting for the embedding hot path.

BASELINE.json's north star prices the fused lookup + sketch-update +
optimizer-apply path against speed-of-light HBM bandwidth. This tool
measures achieved GB/s for each stage at CriteoTB shapes (dim 128, batch
2048, 26 fields) and prints the fraction of the chip's peak HBM bandwidth.

HONEST CLOCK (round-3): each stage's window is ONE jitted lax.scan over
`iters` pre-staged, per-iteration-distinct id batches, accumulating a
scalar checksum; the window ends with a VALUE FETCH of that checksum
(utils/timing.fence). This both defeats the unreliable block_until_ready
sync (round-2 verdict: it can return before device execution on this
runtime) and removes per-dispatch RPC overhead from the measurement —
what remains is device time. Distinct ids per iteration stop XLA from
hoisting the body out of the loop.

Bytes moved per step (the only traffic that matters; everything else is
on-chip):
  lookup    read  B*F rows of dim*4 bytes (hot or cold table)
  update    read+write the same rows (scatter-add read-modify-write)
  sketch    query: B*F bucket lines (3 arrays x cells x 4B)
            insert: ditto + scatter writes
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

# v5e ≈ 819 GB/s HBM; override with --peak_gbs for other chips.
DEFAULT_PEAK_GBS = 819.0


def measure(body, carry_args, ids_stack, iters):
    """Time a jitted scan of `body(carry_args, ids_i) -> f32 checksum`
    over ids_stack [iters, ...]; returns seconds per iteration."""
    import jax
    import jax.numpy as jnp
    from ..utils.timing import fence

    @jax.jit
    def window(carry_args, ids_stack):
        def step(acc, ids_i):
            return acc + body(carry_args, ids_i), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), ids_stack)
        return out

    fence(window(carry_args, ids_stack))  # compile + warm
    t0 = time.time()
    fence(window(carry_args, ids_stack))
    return (time.time() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--fields", type=int, default=26)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--peak_gbs", type=float, default=DEFAULT_PEAK_GBS)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cafe_tpu.ops.sparse import sparse_sgd
    from cafe_tpu.sketch import (HotSketchConfig, init_sketch,
                                 sketch_insert, sketch_query)

    b, f, d, rows = args.batch, args.fields, args.dim, args.rows
    iters = args.iters
    n_ids = b * f
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(0, 0.1, (rows, d)).astype(np.float32))
    # per-iteration-distinct ids so XLA cannot hoist the body
    ids_stack = jnp.asarray(
        rng.integers(0, rows, (iters, n_ids)).astype(np.int32))
    grads = jnp.asarray(rng.normal(0, 0.1, (n_ids, d)).astype(np.float32))

    results = {}

    # 1. pure gather
    dt = measure(lambda c, i: c[0][i].sum(), (table,), ids_stack, iters)
    bytes_moved = n_ids * d * 4
    results["lookup"] = {
        "ms": round(dt * 1e3, 4),
        "gbs": round(bytes_moved / dt / 1e9, 1),
    }

    # 2. optimizer apply (read-modify-write), two arms:
    #    - production path ops/sparse.apply_rows — routes to the pallas
    #      RMW kernel at these shapes (>= 2^20 rows, dim % 128 == 0);
    #      the table is the scan CARRY so the in-place aliasing chains
    #      across iterations without XLA defensive copies
    #    - raw XLA scatter (sparse_sgd) for comparison
    from cafe_tpu.ops.sparse import apply_rows
    from cafe_tpu.utils.timing import fence

    def measure_carry(upd_fn):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def window(tbl, grads_, ids_stack_):
            def step(t, ids_i):
                return upd_fn(t, ids_i, grads_), None
            out, _ = jax.lax.scan(step, tbl, ids_stack_)
            return out
        t = window(table + 0, grads, ids_stack)
        fence(t[0, 0])                     # compile + warm
        t0 = time.time()
        t = window(t, grads, ids_stack)
        fence(t[0, 0])
        return (time.time() - t0) / iters

    bytes_moved = n_ids * d * 4 * 2
    for name, fn in (
            ("optimizer_apply",
             lambda t, i, g: apply_rows(t, {}, i, g, 0.1, "sgd")[0]),
            ("optimizer_scatter",
             lambda t, i, g: sparse_sgd(t, i, g, 0.1))):
        dt = measure_carry(fn)
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "gbs": round(bytes_moved / dt / 1e9, 1),
        }

    # 3. sketch query + insert at CAFE cr=0.001 sizing
    cfg = HotSketchConfig(buckets=max(rows // 1000, 1024), threshold=500.0)
    st = init_sketch(cfg)
    dt = measure(
        lambda c, i: sketch_query(cfg, c[0], i).sum().astype(jnp.float32),
        (st,), ids_stack, iters)
    bytes_moved = n_ids * cfg.cells * 4 * 3
    results["sketch_query"] = {
        "ms": round(dt * 1e3, 4),
        "gbs": round(bytes_moved / dt / 1e9, 1),
    }

    scores = jnp.ones(n_ids, jnp.float32)
    dt = measure(
        lambda c, i: sketch_insert(cfg, c[0], i, c[1])[0].cnt[0, 0],
        (st, scores), ids_stack, iters)
    results["sketch_insert"] = {"ms": round(dt * 1e3, 4)}

    for k, v in results.items():
        if "gbs" in v:
            v["frac_of_peak"] = round(v["gbs"] / args.peak_gbs, 3)
    print(json.dumps({"shapes": {"batch": b, "fields": f, "dim": d,
                                 "table_rows": rows},
                      "peak_gbs": args.peak_gbs,
                      "sync": "scan-window + value-fetch fence",
                      **results}, indent=2))


if __name__ == "__main__":
    main()
