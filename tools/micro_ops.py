"""Microbenchmark candidate lane-op primitives on the real chip.

The tunnel runtime has ~27 ms dispatch latency, so wall-clock timing of
single ops is useless. Instead ONE jitted program chains every candidate
op REPS times (optimization_barrier between reps prevents CSE/elision),
runs under jax.profiler.trace, and the Chrome trace's per-fusion DEVICE
times are aggregated by source line — each op is invoked on its own line
below, so the report reads directly.

Run from repo root: python tools/micro_ops.py
"""

import glob
import gzip
import json
import os
import os.path as osp
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPS = 16
TRACE_DIR = "/tmp/cafe_micro_ops"


def build_ops():
    """op name -> (fn, args). Each fn body sits on ONE distinct source
    line (the lambda line is what the trace attributes to)."""
    import jax
    import jax.numpy as jnp

    B = 53248
    S = 9728
    N = 27136
    D = 16
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, S, B).astype(np.int32))
    sidx = jnp.sort(idx)
    ridx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    sridx = jnp.sort(ridx)
    cell = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))
    vals = jnp.asarray(rng.random(B).astype(np.float32))
    gmat = jnp.asarray(rng.random((B, D)).astype(np.float32))
    tab4 = jnp.asarray(rng.random((S, 4)).astype(np.float32))
    tab8i = jnp.asarray(rng.integers(0, 100, (S, 8)).astype(np.int32))
    tab16i = jnp.asarray(rng.integers(0, 100, (S, 16)).astype(np.int32))
    tabND = jnp.asarray(rng.random((N, D)).astype(np.float32))
    rows27 = jnp.arange(N, dtype=jnp.int32)
    bc = jnp.asarray(rng.random((B, 4)).astype(np.float32))
    idx4k = idx[:4096]
    v4k = jnp.asarray(rng.integers(0, 99, 4096).astype(np.int32))

    ops = {}

    def add(name, fn, *args):
        ops[name] = (fn, args)

    add("scat_add_S4_plain", lambda t, i, c, v: t.at[i, c].add(v, mode="drop"), tab4, idx, cell, vals)
    add("scat_add_S4_hints", lambda t, i, c, v: t.at[i, c].add(v, mode="drop", indices_are_sorted=True, unique_indices=True), tab4, sidx, cell, vals)
    add("scat_add_S8_packed", lambda t, i, c, v: t.at[i, c].add(v, mode="drop"), tab8i, idx, cell, v4k[0] + jnp.zeros((B,), jnp.int32))
    add("scat_add_N16_plain", lambda t, i, g: t.at[i].add(g, mode="drop"), tabND, ridx, gmat)
    add("scat_add_N16_hints", lambda t, i, g: t.at[i].add(g, mode="drop", indices_are_sorted=True, unique_indices=True), tabND, sridx, gmat)
    add("scat_set_S16_4klanes", lambda t, i, v: t.at[i, 3].set(v, mode="drop"), tab16i, idx4k, v4k)
    add("scat_add_S4_4klanes", lambda t, i, v: t.at[i, 2].add(v, mode="drop"), tab4, idx4k, v4k.astype(jnp.float32))
    add("tala_B4", lambda b, c: jnp.take_along_axis(b, c[:, None], 1)[:, 0], bc, cell)
    add("onehot_sel_B4", lambda b, c: jnp.sum(jnp.where(c[:, None] == jnp.arange(4)[None, :], b, 0.0), 1), bc, cell)
    add("gather_S4_B", lambda t, i: t[i], tab4, idx)
    add("gather_S8i_B", lambda t, i: t[i], tab8i, idx)
    add("gather_S16i_B", lambda t, i: t[i], tab16i, idx)
    add("gather_N16_B", lambda t, i: t[i], tabND, ridx)
    add("gather_S1d_B", lambda t, i: t[i], tab4[:, 0], idx)
    add("gather_S16i_4k", lambda t, i: t[i], tab16i, idx4k)
    add("ss_denseN_in_B_scan", lambda a, q: jnp.searchsorted(a, q, method="scan_unrolled"), sridx, rows27)
    add("ss_denseN_in_B_sort", lambda a, q: jnp.searchsorted(a, q, method="sort"), sridx, rows27)
    add("ss_4kq_in_B_scan", lambda a, q: jnp.searchsorted(a, q, method="scan_unrolled"), sridx, rows27[:4096])
    add("ss_Bq_in_4k_scan", lambda a, q: jnp.searchsorted(a, q, method="scan_unrolled"), sridx[:4096], ridx)
    add("cumsum_B16_f32", lambda g: jnp.cumsum(g, axis=0), gmat)
    add("cumsum_B_s32", lambda i: jnp.cumsum(i), idx)
    add("sort3_B_2keys", lambda a, b2, c: jax.lax.sort((a, b2, c), num_keys=2), idx, ridx, vals)
    add("argsort_B", lambda i: jnp.argsort(i), idx)
    add("segsum_B_S_hint", lambda v, s: jax.ops.segment_sum(v, s, num_segments=S, indices_are_sorted=True), vals, sidx)
    add("segsum_B16_N_hint", lambda g, s: jax.ops.segment_sum(g, s, num_segments=N, indices_are_sorted=True), gmat, sridx)
    return ops


def main():
    import jax

    ops = build_ops()
    names = list(ops)

    def chained(all_args):
        outs = []
        for name in names:
            fn, _ = ops[name]
            args = all_args[name]
            for _ in range(REPS):
                args = jax.lax.optimization_barrier(args)
                out = fn(*args)
                args = jax.lax.optimization_barrier((args, out))[0]
            outs.append(out)
        return outs

    jfn = jax.jit(chained)
    all_args = {n: ops[n][1] for n in names}
    from cafe_tpu.utils.timing import fence
    print("compiling...", flush=True)
    out = jfn(all_args)
    fence(out)
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        out = jfn(all_args)
        fence(out)

    paths = glob.glob(osp.join(TRACE_DIR, "plugins", "profile", "*",
                               "*.trace.json.gz"))
    p = max(paths, key=os.path.getmtime)
    raw = json.loads(gzip.open(p).read())
    tname = {}
    for e in raw["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    here = osp.abspath(__file__)
    line2op = {}
    import inspect
    src, start = inspect.getsourcelines(build_ops)
    for off, text in enumerate(src):
        t = text.strip()
        if t.startswith('add("'):
            line2op[start + off] = t.split('"')[1]
    agg = defaultdict(float)
    other = 0.0
    for e in raw["traceEvents"]:
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        if tname.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        src_s = a.get("source", "")
        if here.split("/")[-1] in src_s:
            ln = int(src_s.rsplit(":", 1)[1])
            # attribute to the nearest op line at or before ln
            cand = [k for k in line2op if k <= ln]
            key = line2op[max(cand)] if cand else f"line{ln}"
            agg[key] += e["dur"]
        else:
            other += e["dur"]
    print(f"\nper-op DEVICE time (avg over {REPS} reps):")
    for n in names:
        print(f"  {n:28s} {agg.get(n, 0.0) / REPS:9.1f} us")
    print(f"  (unattributed other: {other / REPS:.1f} us/rep-equivalent)")


if __name__ == "__main__":
    main()
