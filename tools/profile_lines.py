"""Trace one jitted function and aggregate device time by source line.

Shared helper for the round-4 kernel work: run_and_report(fn, args)
compiles fn, runs it under jax.profiler.trace, and prints XLA-fusion
device time per source file:line (descending). The function should
chain REPS of the op under test through optimization_barriers so the
per-rep cost stands out over the tunnel dispatch latency.

Usage (as a script): profiles the bench-shape sketch_insert.
    python tools/profile_lines.py [--reps 30]
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

TRACE_DIR = "/tmp/cafe_profile_lines"


def run_and_report(jfn, args, reps, top=40, trace_dir=TRACE_DIR):
    import jax
    from cafe_tpu.utils.timing import fence

    print("compiling...", flush=True)
    out = jfn(*args)
    fence(out)
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        out = jfn(*args)
        fence(out)

    paths = glob.glob(osp.join(trace_dir, "plugins", "profile", "*",
                               "*.trace.json.gz"))
    p = max(paths, key=os.path.getmtime)
    raw = json.loads(gzip.open(p).read())
    tname = {}
    for e in raw["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    agg = defaultdict(lambda: [0.0, 0])
    tot = 0.0
    for e in raw["traceEvents"]:
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        if tname.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        src = e.get("args", {}).get("source", "?").replace(os.getcwd() + "/",
                                                           "")
        agg[src][0] += e["dur"]
        agg[src][1] += 1
        tot += e["dur"]
    print(f"total device: {tot / reps:.1f} us/rep over {reps} reps")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for src, (d, n) in rows[:top]:
        print(f"{d / reps:9.2f} us/rep x{n / reps:7.1f}  {src}")
    return tot / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--what", default="insert",
                    choices=["insert", "apply27k", "query"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch import hotsketch as hs

    B, HOT = 53248, 9728
    rng = np.random.default_rng(0)
    u = rng.random(B) ** 4.0
    ids = jnp.asarray(((u * 33_000_000).astype(np.int64) * 1000000007
                       % 33_000_000).astype(np.int32))
    scores = jnp.asarray(rng.random(B).astype(np.float32) + 0.5)
    cfg = hs.HotSketchConfig(buckets=HOT, threshold=500.0)
    st = hs.init_sketch(cfg)
    R = args.reps

    if args.what == "insert":
        def chained(st, ids, scores):
            for _ in range(R):
                (st, ids, scores) = jax.lax.optimization_barrier(
                    (st, ids, scores))
                st, _ = hs.sketch_insert(cfg, st, ids, scores)
            return st
        jfn = jax.jit(chained)
        run_and_report(jfn, (st, ids, scores), R)
    elif args.what == "query":
        def chained(st, ids):
            acc = jnp.int32(0)
            for _ in range(R):
                (st, ids, acc) = jax.lax.optimization_barrier(
                    (st, ids, acc))
                q = hs.sketch_query(cfg, st, ids)
                acc = acc + q.sum()
            return acc
        jfn = jax.jit(chained)
        run_and_report(jfn, (st, ids), R)
    else:
        from cafe_tpu.ops.sorted_update import apply_rows_pass
        NTAB, D = 27136, 16
        tab = jnp.asarray(rng.standard_normal((NTAB, D)).astype(np.float32))
        ridx = jnp.asarray(rng.integers(0, NTAB, B).astype(np.int32))
        grad = jnp.asarray(
            rng.standard_normal((B, D)).astype(np.float32) * .01)

        def chained(tab, ridx, grad):
            for _ in range(R):
                (tab, ridx, grad) = jax.lax.optimization_barrier(
                    (tab, ridx, grad))
                tab, _ = apply_rows_pass(tab, {}, ridx, grad, 0.05, "sgd")
            return tab
        jfn = jax.jit(chained)
        run_and_report(jfn, (tab, ridx, grad), R)


if __name__ == "__main__":
    main()
