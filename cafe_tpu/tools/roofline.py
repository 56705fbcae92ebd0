"""Roofline accounting for the embedding hot path.

BASELINE.json's north star prices the fused lookup + sketch-update +
optimizer-apply path against speed-of-light HBM bandwidth. This tool
measures achieved GB/s for each stage at CriteoTB shapes (dim 128, batch
2048, 26 fields) and prints the fraction of the chip's peak HBM bandwidth.

Bytes moved per step (the only traffic that matters; everything else is
on-chip):
  lookup    read  B*F rows of dim*4 bytes (hot or cold table)
  update    read+write the same rows (scatter-add read-modify-write)
  sketch    query: B*F bucket lines (3 arrays x cells x 4B)
            insert: ditto + scatter writes
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# v5e ≈ 819 GB/s HBM; override with --peak_gbs for other chips.
DEFAULT_PEAK_GBS = 819.0


def measure(fn, args, iters=200):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--fields", type=int, default=26)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--peak_gbs", type=float, default=DEFAULT_PEAK_GBS)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cafe_tpu.ops.sparse import sparse_sgd
    from cafe_tpu.sketch import (HotSketchConfig, init_sketch,
                                 sketch_insert, sketch_query)

    b, f, d, rows = args.batch, args.fields, args.dim, args.rows
    n_ids = b * f
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(0, 0.1, (rows, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, n_ids).astype(np.int32))
    grads = jnp.asarray(rng.normal(0, 0.1, (n_ids, d)).astype(np.float32))

    results = {}

    # 1. pure gather
    gather = jax.jit(lambda t, i: t[i].sum(axis=0))
    dt = measure(gather, (table, ids))
    bytes_moved = n_ids * d * 4
    results["lookup"] = {
        "ms": round(dt * 1e3, 4),
        "gbs": round(bytes_moved / dt / 1e9, 1),
    }

    # 2. scatter-add optimizer apply (read-modify-write)
    upd = jax.jit(lambda t, i, g: sparse_sgd(t, i, g, 0.1))
    dt = measure(upd, (table, ids, grads))
    bytes_moved = n_ids * d * 4 * 2
    results["optimizer_apply"] = {
        "ms": round(dt * 1e3, 4),
        "gbs": round(bytes_moved / dt / 1e9, 1),
    }

    # 3. sketch query + insert at CAFE cr=0.001 sizing
    cfg = HotSketchConfig(buckets=max(rows // 1000, 1024), threshold=500.0)
    st = init_sketch(cfg)
    q = jax.jit(lambda s_, i_: sketch_query(cfg, s_, i_).sum())
    dt = measure(q, (st, ids))
    bytes_moved = n_ids * cfg.cells * 4 * 3
    results["sketch_query"] = {
        "ms": round(dt * 1e3, 4),
        "gbs": round(bytes_moved / dt / 1e9, 1),
    }

    ins = lambda s_, i_, sc_: sketch_insert(cfg, s_, i_, sc_)  # noqa: E731
    scores = jnp.ones(n_ids, jnp.float32)
    dt = measure(lambda s_, i_: ins(s_, i_, scores)[0].cnt.sum(),
                 (st, ids))
    results["sketch_insert"] = {"ms": round(dt * 1e3, 4)}

    for k, v in results.items():
        if "gbs" in v:
            v["frac_of_peak"] = round(v["gbs"] / args.peak_gbs, 3)
    print(json.dumps({"shapes": {"batch": b, "fields": f, "dim": d,
                                 "table_rows": rows},
                      "peak_gbs": args.peak_gbs, **results}, indent=2))


if __name__ == "__main__":
    main()
