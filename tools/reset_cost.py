"""On-chip cost of the CAFE+ adaptive-threshold reset (VERDICT r3 item 6).

`_reset` (cafe_tpu/sketch/hotsketch_plus.py) is a jitted global rank over
all candidate cells — at CriteoTB scale that is ~lim buckets x 4 cells of
argsort. It fires inside `sketch_insert_plus` via lax.cond when
`real_n > 1.2*lim` (reference: tricks/sketch.cpp:275,291 calling
reset() at numerator/n > 1.2). This tool measures, on the honest clock:

  1. steady-state insert step (cond NOT taken),
  2. insert step with the reset branch forced every call,
  3. the implied per-fire cost and its amortization: real_n grows only
     by threshold CROSSINGS, and a reset rebases it to <= lim-1, so at
     least ceil(0.2*lim / batch) steps separate consecutive fires even
     if every lane crossed every step. On a real Zipf stream crossings
     are a tiny fraction of lanes; the tool also counts empirical fires.

    python tools/reset_cost.py [--lim 1000000] [--batch 53248]
"""

import argparse
import json
import math
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timed_windows(fn, windows=5, reps=10):
    """Median us/call over interleaved windows, value-fetch fenced."""
    from cafe_tpu.utils.timing import fence
    out = []
    for _ in range(windows):
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        fence(r)
        out.append((time.perf_counter() - t0) / reps * 1e6)
    return float(np.median(out)), float(min(out)), float(max(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lim", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=53248)  # 2048 x 26
    ap.add_argument("--vocab", type=int, default=33_762_577)
    ap.add_argument("--stream_steps", type=int, default=200)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch.hotsketch_plus import (
        CafePlusConfig, init_sketch_plus, sketch_insert_plus)

    cfg = CafePlusConfig(lim=args.lim, threshold=50.0)
    st0 = init_sketch_plus(cfg)
    cells = cfg.cells * (st0.val1.shape[0] + st0.val2.shape[0])
    print(f"device: {jax.devices()[0].device_kind}  lim={args.lim} "
          f"({cells/1e6:.1f}M candidate cells)  batch={args.batch}")

    rng = np.random.default_rng(0)
    zipf = np.minimum(rng.zipf(1.1, size=(args.batch,)), args.vocab)
    ids = jnp.asarray(zipf.astype(np.int32))
    scores = jnp.asarray(rng.random(args.batch, dtype=np.float32) * 4.0)

    # warm the sketch so steady-state isn't an all-empty fast path
    st = st0
    for i in range(8):
        st, _ = sketch_insert_plus(cfg, st, ids + i, scores)
    st = jax.block_until_ready(st)
    # pin real_n safely below the trip point -> cond never taken
    st_cold = st._replace(real_n=jnp.asarray(0, jnp.int32))
    # pin real_n above the trip point; re-pin per call so EVERY call
    # takes the reset branch (a real fire would rebase real_n)
    hot_n = jnp.asarray(int(cfg.lim * 1.2) + 1, jnp.int32)

    def steady():
        s, _ = sketch_insert_plus(cfg, st_cold, ids, scores)
        return s

    def forced():
        s, _ = sketch_insert_plus(
            cfg, st_cold._replace(real_n=hot_n), ids, scores)
        return s

    steady_us, smin, smax = timed_windows(steady)
    forced_us, fmin, fmax = timed_windows(forced)
    per_fire_us = forced_us - steady_us

    # worst-case amortization: every lane crosses every step
    min_gap = math.ceil(0.2 * cfg.lim / args.batch)
    worst_overhead = per_fire_us / (min_gap * steady_us)

    # empirical fire count on a fresh Zipf stream
    st = st0
    fires = 0
    trip = int(cfg.lim * 1.2)
    for i in range(args.stream_steps):
        z = np.minimum(rng.zipf(1.1, size=(args.batch,)), args.vocab)
        before = int(st.real_n)
        st, _ = sketch_insert_plus(
            cfg, st, jnp.asarray(z.astype(np.int32)), scores)
        if before > trip:
            fires += 1
    st = jax.block_until_ready(st)

    res = {
        "lim": args.lim, "batch": args.batch,
        "candidate_cells": int(cells),
        "steady_us": round(steady_us, 1),
        "steady_minmax": [round(smin, 1), round(smax, 1)],
        "forced_reset_us": round(forced_us, 1),
        "forced_minmax": [round(fmin, 1), round(fmax, 1)],
        "per_fire_us": round(per_fire_us, 1),
        "worst_case_min_steps_between_fires": min_gap,
        "worst_case_amortized_overhead": round(worst_overhead, 4),
        "zipf_stream_steps": args.stream_steps,
        "zipf_stream_fires": fires,
    }
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
