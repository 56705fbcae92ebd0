"""Interleaved A/B: scatter writes vs the scatter-free sorted machinery.

Round-4 decision input. The round-3/4 scatter-free rework assumed XLA's
TPU scatter serializes per lane (~0.5 ms / 53k lanes, docs/PERF.md); the
round-4 profile of the reworked step shows the REPLACEMENT machinery
(searchsorted + one-hot gather_1d + argsort) costing ~4.4 ms/step while
micro_ops clocks a plain 53k-lane row scatter at ~23 us on the current
runtime. This harness settles it at the exact bench shapes, interleaved
within one process (the tunnel swings +-25% window-to-window, so never
compare across processes — docs/PERF.md protocol):

  A1/A2  sketch_insert: r4 scatter-free vs r3 scatter design
         (the r3 module is checked out from git into /tmp by the runner)
  B1/B2  apply_rows (sgd + adagrad): sorted full-table pass vs
         dedup-first scatter at the CAFE table shape (27k rows)
  C1/C2  big-table scatter vs nothing (full-method shape, 2M rows here
         to keep init fast; scatter cost is lane-bound, not table-bound)

Usage: python tools/ab_scatter_vs_sorted.py [--reps 30] [--windows 5]
"""

import argparse
import os.path as osp
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

B = 53248          # 2048 batch x 26 fields
HOT = 9728         # bench-protocol sketch buckets
NTAB = 27136       # bench-protocol cafe table rows
NBIG = 2_000_000   # stand-in for the full-table shape (lane-bound anyway)
D = 16


def load_r3_hotsketch():
    """Check the round-3 hotsketch out of git into an importable module."""
    src = subprocess.check_output(
        ["git", "show", "0e6eb9e:cafe_tpu/sketch/hotsketch.py"],
        cwd=osp.dirname(osp.dirname(osp.abspath(__file__)))).decode()
    path = "/tmp/hotsketch_r3_ab.py"
    with open(path, "w") as f:
        f.write(src)
    import importlib.util
    spec = importlib.util.spec_from_file_location("hotsketch_r3", path)
    mod = importlib.util.module_from_spec(spec)
    # the r3 module does relative imports of the package's base helpers
    mod.__package__ = "cafe_tpu.sketch"
    sys.modules["hotsketch_r3"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch import hotsketch as hs4
    from cafe_tpu.ops import sparse, sorted_update
    from cafe_tpu.utils.timing import fence

    hs3 = load_r3_hotsketch()

    rng = np.random.default_rng(0)
    u = rng.random(B) ** 4.0
    ids = jnp.asarray(((u * 33_000_000).astype(np.int64) * 1000000007
                       % 33_000_000).astype(np.int32))
    scores = jnp.asarray(rng.random(B).astype(np.float32) + 0.5)
    ridx = jnp.asarray((rng.integers(0, NTAB, B)).astype(np.int32))
    bigidx = jnp.asarray((rng.integers(0, NBIG, B)).astype(np.int32))
    grad = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32) * .01)

    cfg4 = hs4.HotSketchConfig(buckets=HOT, threshold=500.0)
    cfg3 = hs3.HotSketchConfig(buckets=HOT, threshold=500.0)
    st4 = hs4.init_sketch(cfg4)
    st3 = hs3.init_sketch(cfg3)
    tab = jnp.asarray(rng.standard_normal((NTAB, D)).astype(np.float32))
    acc = jnp.zeros_like(tab)
    big = jnp.zeros((NBIG, D), jnp.float32)

    R = args.reps

    def chain(fn, n_state_args):
        """Repeat fn R times chaining all args through opt barriers."""
        def run(*arrs):
            out = None
            for _ in range(R):
                arrs = jax.lax.optimization_barrier(arrs)
                out = fn(*arrs)
                new_state = out if isinstance(out, tuple) else (out,)
                arrs = tuple(new_state[:n_state_args]) + arrs[n_state_args:]
            return arrs[:n_state_args]
        return jax.jit(run)

    variants = {}

    # NULL: pure dispatch+fence cost of the chain harness — the tunnel's
    # ~27ms dispatch latency shows up as (latency/R) per rep in every
    # variant; subtract the null when reading the table.
    variants["null"] = (
        chain(lambda t: (t,), 1), (tab,))

    # A: sketch insert (state chains; ids/scores fixed)
    variants["insert_r4_scatterfree"] = (
        chain(lambda st, i, s: (hs4.sketch_insert(cfg4, st, i, s)[0],),
              1), (st4, ids, scores))
    variants["insert_r3_scatter"] = (
        chain(lambda st, i, s: (hs3.sketch_insert(cfg3, st, i, s)[0],),
              1), (st3, ids, scores))

    # B: apply_rows on the cafe-sized table
    for opt, slots in (("sgd", {}), ("adagrad", {"acc": acc})):
        variants[f"apply27k_pass_{opt}"] = (
            chain(lambda t, *sl, _o=opt: tuple(
                x for x in (lambda r: (r[0],) + tuple(r[1].values()))(
                    sorted_update.apply_rows_pass(
                        t, dict(zip(["acc"] if _o == "adagrad" else [],
                                    sl)), ridx, grad, 0.05, _o))),
                  1 + len(slots)), (tab, *slots.values()))
        variants[f"apply27k_scat_{opt}"] = (
            chain(lambda t, *sl, _o=opt: tuple(
                x for x in (lambda r: (r[0],) + tuple(r[1].values()))(
                    sparse.apply_rows(
                        t, dict(zip(["acc"] if _o == "adagrad" else [],
                                    sl)), ridx, grad, 0.05, _o,
                        table_pass=False))),
                  1 + len(slots)), (tab, *slots.values()))

    # C: the big-table scatter (full-method shape; dedup-first + scatter)
    variants["applyBIG_scat_sgd"] = (
        chain(lambda t: (sparse.apply_rows(t, {}, bigidx, grad, 0.05,
                                           "sgd", table_pass=False)[0],),
              1), (big,))

    # compile all
    print("compiling...", flush=True)
    compiled = {}
    for name, (fn, a) in variants.items():
        out = fn(*a)
        fence(out)
        compiled[name] = (fn, a)
    print("running...", flush=True)

    results = {k: [] for k in compiled}
    for w in range(args.windows):
        for name, (fn, a) in compiled.items():
            t0 = time.time()
            out = fn(*a)
            fence(out)
            results[name].append((time.time() - t0) / R * 1e6)
    print(f"\nus per op (median of {args.windows} interleaved windows, "
          f"{R} reps each):")
    for name, times in results.items():
        med = float(np.median(times))
        print(f"  {name:28s} {med:9.1f} us   "
              f"(min {min(times):.1f} max {max(times):.1f})")


if __name__ == "__main__":
    main()
