"""Interleaved A/B of the sketch-insert landing implementations.

The insert's one B-lane landing reduction (ops/sorted_update.land_max)
is the costliest op in the reference-exact (insert-interval-1) CAFE
step. Arms: 'segmax' (round-4 baseline), 'segsum1' (single-writer sum
trick), 'scan' (log-depth segmented cummax + end-lane gather — no
serial reduce). Two levels:

  1. isolated sketch_insert at bench shapes (53k lanes);
  2. the full fused cafe train step per land_impl.

Protocol: all arms compiled + warmed first, then timed in INTERLEAVED
windows within one process (tunnel swings +-25%; docs/PERF.md rules),
value-fetch fenced.

    python tools/ab_insert_land.py [--windows 5] [--steps 60]
"""

import argparse
import faulthandler
import json
import os.path as osp
import signal
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

IMPLS = ["segmax", "segsum1", "scan", "pallas"]


def interleave(arms, windows, steps, fence):
    carries = {k: c for k, (_, c) in arms.items()}
    for name, (run, _) in arms.items():
        print(f"compile+warm arm {name}...", flush=True)
        t0 = time.time()
        for _ in range(6):
            carries[name] = run(carries[name])
        fence(carries[name])
        print(f"  {name} ready in {time.time() - t0:.1f}s", flush=True)
    out = {k: [] for k in arms}
    for _ in range(windows):
        for name, (run, _) in arms.items():
            c = carries[name]
            t0 = time.perf_counter()
            for _ in range(steps):
                c = run(c)
            fence(c)
            out[name].append((time.perf_counter() - t0) / steps * 1e6)
            carries[name] = c
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lanes", type=int, default=53248)
    ap.add_argument("--buckets", type=int, default=33792)
    ap.add_argument("--impls", nargs="+", default=IMPLS)
    ap.add_argument("--skip_level2", action="store_true")
    args = ap.parse_args()
    # a hang leaves a stack: kill -USR1 <pid> prints all threads
    faulthandler.register(signal.SIGUSR1)
    faulthandler.dump_traceback_later(1200, exit=True)

    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch.hotsketch import (HotSketchConfig, init_sketch,
                                           sketch_insert)
    from cafe_tpu.utils.timing import fence

    rng = np.random.default_rng(0)
    b = args.lanes
    n_batches = 8
    ids = [jnp.asarray(((rng.random(b) ** 4) * 33762577).astype(np.int32))
           for _ in range(n_batches)]
    sc = [jnp.asarray(rng.random(b, dtype=np.float32) * 2.0)
          for _ in range(n_batches)]

    # ---- level 1: isolated insert ---------------------------------
    arms = {}
    for impl in args.impls:
        cfg = HotSketchConfig(buckets=args.buckets, threshold=500.0,
                              land_impl=impl)

        def run(carry, cfg=cfg):
            st, i = carry
            st, _ = sketch_insert(cfg, st, ids[i % n_batches],
                                  sc[i % n_batches])
            return st, i + 1

        arms[impl] = (run, (init_sketch(cfg), 0))
    res = interleave(arms, args.windows, args.steps,
                     lambda c: fence(c[0]))
    med = {k: round(float(np.median(v)), 1) for k, v in res.items()}
    print(json.dumps({"level": "insert_us", **med,
                      "windows": {k: [round(x, 1) for x in v]
                                  for k, v in res.items()}}), flush=True)

    # ---- correctness cross-check: all impls produce identical state
    cfgs = {i: HotSketchConfig(buckets=4096, threshold=50.0, land_impl=i)
            for i in args.impls}
    sts = {i: init_sketch(cfgs[i]) for i in args.impls}
    for k in range(4):
        for i in args.impls:
            sts[i], _ = sketch_insert(cfgs[i], sts[i], ids[k][:8192],
                                      sc[k][:8192])
    ref = jax.device_get(sts[args.impls[0]])
    for i in args.impls[1:]:
        got = jax.device_get(sts[i])
        same = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(ref, got))
        print(json.dumps({"level": "equal_state", "impl": i,
                          "equal": bool(same)}), flush=True)

    # ---- level 2: full fused cafe step per impl --------------------
    if args.skip_level2:
        return
    from bench import make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all

    train_data, batches = make_criteo_batches(n_batches=8)
    arms2 = {}
    for impl in args.impls:
        cfg = Config(dataset="criteo", model="dlrm", embedding_dim=16,
                     compress_method="cafe", compress_rate=0.001,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=2048, learning_rate=0.1,
                     optimizer="sgd", bf16=True, cafe_insert_interval=1,
                     cafe_land_impl=impl)
        _, _, state, train_step, _ = build_all(cfg, train_data)

        def run(carry, step=train_step):
            st, i = carry
            d, s, l, v = batches[i % len(batches)]
            st, m = step(st, d, s, l, v)
            return st, i + 1

        arms2[impl] = (run, (state, 0))
    res2 = interleave(arms2, args.windows, args.steps,
                      lambda c: fence(c[0]))
    med2 = {k: round(float(np.median(v)), 1) for k, v in res2.items()}
    print(json.dumps({"level": "cafe_step_us", **med2,
                      "windows": {k: [round(x, 1) for x in v]
                                  for k, v in res2.items()}}), flush=True)


if __name__ == "__main__":
    main()
