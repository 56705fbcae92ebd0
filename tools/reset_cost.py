"""On-chip cost of the CAFE+ adaptive-threshold reset (round-3 verdict
item 6).

`_reset` is a jitted global sort over all main+staging cells
(sketch/hotsketch_plus.py). It fires when `real_n > 1.2 * lim`
(sketch.cpp:275,291's rule). This tool measures, per lim:

  1. steady-state insert (no reset firing),
  2. insert with the reset cond taken EVERY call (real_n pinned high),

interleaved in one process (tunnel variance protocol, docs/PERF.md), and
reports the reset's marginal cost + the amortized bound: the reset fires
at most once per ~0.2*lim threshold crossings, so per-step cost is
marginal/(crossings between firings).

    python tools/reset_cost.py [--lims 65536 1048576 8388608]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

B = 53248  # bench lanes: batch 2048 x 26 fields


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lims", type=int, nargs="+",
                    default=[65536, 1048576, 8388608])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch import hotsketch_plus as hp
    from cafe_tpu.utils.timing import fence

    rng = np.random.default_rng(0)
    u = rng.random(B) ** 4.0
    ids = jnp.asarray(((u * 33_000_000).astype(np.int64) * 1000000007
                       % 33_000_000).astype(np.int32))
    scores = jnp.asarray(rng.random(B).astype(np.float32) + 0.5)
    R = args.reps

    for lim in args.lims:
        cfg = hp.CafePlusConfig(lim=lim, threshold=2.0,
                                adjust_threshold=True)
        st0 = hp.init_sketch_plus(cfg)

        def chain(force_reset):
            def run(st, ids, scores):
                for _ in range(R):
                    (st, ids, scores) = jax.lax.optimization_barrier(
                        (st, ids, scores))
                    if force_reset:
                        # pin the trigger: real_n over the 1.2*lim line
                        st = st._replace(real_n=jnp.asarray(
                            int(cfg.lim * 1.2) + 2, jnp.int32))
                    st, _ = hp.sketch_insert_plus(cfg, st, ids, scores)
                return st
            return jax.jit(run)

        steady = chain(False)
        resetty = chain(True)
        fence(steady(st0, ids, scores))
        fence(resetty(st0, ids, scores))
        t_s, t_r = [], []
        for _ in range(args.windows):
            t0 = time.time()
            fence(steady(st0, ids, scores))
            t_s.append((time.time() - t0) / R * 1e6)
            t0 = time.time()
            fence(resetty(st0, ids, scores))
            t_r.append((time.time() - t0) / R * 1e6)
        s, r = float(np.median(t_s)), float(np.median(t_r))
        cells = int(0.9 * lim) * 4 + int(0.1 * lim) * 4
        # the trigger needs ~0.2*lim NEW crossings after the previous
        # reset set real_n = lim-1; at <= B crossings per step that is
        # >= 0.2*lim/B steps between firings
        steps_between = max(0.2 * lim / B, 1.0)
        print(f"lim={lim:>8}  cells={cells:>9}  steady={s:8.1f} us/insert"
              f"  with-reset={r:8.1f} us  marginal={r - s:8.1f} us"
              f"  amortized<={(r - s) / steps_between:7.2f} us/step"
              f"  (fires at most every ~{steps_between:.0f} steps)",
              flush=True)


if __name__ == "__main__":
    main()
