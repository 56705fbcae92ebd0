"""Interleaved A/B re-validation of round-2's perf-driven decisions.

Round 2 made four perf-driven design decisions on a clock that was later
shown to measure the tunnel's RPC rate (VERDICT r2, weak #1). The code
decisions are correctness-neutral and stand; this tool re-derives their
QUANTITATIVE justification on the honest value-fetch clock so docs/PERF.md
can quote one table per decision (VERDICT r2, next-round #2):

  1. donate_state: off (default) vs on        — bench.py protocol, K=8
  2. migration-lane cap (cafe_mig_lanes=256)  vs uncapped, criteotb
     dim-128 shapes (the config that exposed the original 43%-of-step cost)
  3. sortless sketch insert vs sort+segment-sum pre-combine
  4. XLA native gather vs the Pallas DMA gather (ops/pallas_gather),
     CriteoTB row shapes

Protocol: all arms of a decision are compiled + warmed first, then timed
in INTERLEAVED windows (A, B, A, B, ...) within one process — the tunnel
runtime swings ±25% window-to-window, so only interleaved medians are
comparable (docs/PERF.md measurement rules). Every window ends with the
value-fetch fence (cafe_tpu/utils/timing.fence); jax.block_until_ready is
not trusted on this runtime.

Run from the repo root WITHOUT PYTHONPATH (axon plugin gotcha):
    python tools/ab_decisions.py [--decisions 1 2 3 4] [--windows 5]
Prints one JSON line per decision.
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

WINDOWS = 5
STEPS = 120


def interleave(arms, windows, steps, fence):
    """arms: {name: (run_one_step, initial_carry)}. run_one_step(carry) ->
    carry; carry is fenced at each window end. Returns
    {name: [window_us_per_step, ...]} measured A,B,A,B,... so every arm
    samples the same tunnel weather."""
    carries = {k: c for k, (_, c) in arms.items()}
    # warmup + compile every arm BEFORE any timing
    for name, (run, _) in arms.items():
        for _ in range(10):
            carries[name] = run(carries[name])
        fence(carries[name])
    out = {k: [] for k in arms}
    for _ in range(windows):
        for name, (run, _) in arms.items():
            c = carries[name]
            t0 = time.time()
            for _ in range(steps):
                c = run(c)
            fence(c)
            out[name].append((time.time() - t0) / steps * 1e6)
            carries[name] = c
    return out


def report(decision, arms_us, note=""):
    meds = {k: float(np.median(v)) for k, v in arms_us.items()}
    spread = {k: [round(min(v), 1), round(max(v), 1)]
              for k, v in arms_us.items()}
    ks = list(meds)
    line = {
        "decision": decision,
        "median_us_per_step": {k: round(v, 1) for k, v in meds.items()},
        "window_spread_us": spread,
        "ratio": round(meds[ks[1]] / meds[ks[0]], 3) if len(ks) == 2 else None,
        "note": note,
    }
    print(json.dumps(line), flush=True)
    return line


def decision_donate(windows):
    """1. donate_state off vs on at the bench.py protocol (K=8 fused)."""
    import jax.numpy as jnp
    from bench import BATCH, DISPATCH_K, make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from cafe_tpu.train.step import build_multi_step
    from cafe_tpu.utils.timing import fence

    train_data, batches = make_criteo_batches(n_batches=16)
    fused = []
    for i in range(0, len(batches) - DISPATCH_K + 1, DISPATCH_K):
        grp = batches[i:i + DISPATCH_K]
        fused.append((jnp.concatenate([g[0] for g in grp]),
                      jnp.concatenate([g[1] for g in grp]),
                      jnp.concatenate([g[2] for g in grp]),
                      jnp.asarray(DISPATCH_K * BATCH, jnp.int32)))

    arms = {}
    for name, donate in (("donate_off", False), ("donate_on", True)):
        cfg = Config(dataset="criteo", model="dlrm", embedding_dim=16,
                     compress_method="cafe", compress_rate=0.001,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=BATCH, learning_rate=0.1,
                     optimizer="sgd", bf16=True, donate_state=donate)
        model, embed, state, step, _ = build_all(cfg, train_data)
        multi = build_multi_step(step, DISPATCH_K, donate=donate)

        def run(carry, multi=multi):
            st, i = carry
            d, s, l, v = fused[i % len(fused)]
            st, m = multi(st, d, s, l, v)
            return (st, i + 1)

        arms[name] = (run, (state, 0))
    us = interleave(arms, windows, STEPS // DISPATCH_K, fence)
    return report("donate_state", us,
                  f"us per {DISPATCH_K}-step dispatch, batch {BATCH}")


def decision_migration_cap(windows):
    """2. cafe_mig_lanes=256 (capped, lossless-revert) vs uncapped at the
    criteotb latency shapes (dim 128, cr=0.1) that exposed the original
    claim (migration gather/scatter 43% of the step)."""
    from bench import BATCH, make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from cafe_tpu.utils.timing import fence

    train_data, batches = make_criteo_batches(n_batches=8)
    arms = {}
    for name, lanes in (("cap_256", 256), ("uncapped", 1 << 26)):
        cfg = Config(dataset="criteotb", model="dlrm", embedding_dim=128,
                     compress_method="cafe", compress_rate=0.1,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=BATCH, learning_rate=0.1,
                     optimizer="sgd", bf16=True, cafe_mig_lanes=lanes)
        model, embed, state, step, _ = build_all(cfg, train_data)

        def run(carry, step=step):
            st, i = carry
            d, s, l, v = batches[i % len(batches)]
            st, m = step(st, d, s, l, v)
            return (st, i + 1)

        arms[name] = (run, (state, 0))
    us = interleave(arms, windows, STEPS, fence)
    return report("migration_lane_cap", us,
                  f"full train step, dim 128 cr=0.1, batch {BATCH}")


def decision_sortless_insert(windows):
    """3. sortless scatter-combine insert (production) vs the rejected
    sort + segment-sum pre-combine front end feeding the same insert."""
    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch.hotsketch import (HotSketchConfig, INVALID_ID,
                                           init_sketch, sketch_insert)
    from cafe_tpu.utils.timing import fence

    cfg = HotSketchConfig(buckets=1 << 16, cells=4, threshold=500.0)
    state0 = init_sketch(cfg)
    rng = np.random.default_rng(0)
    m = 2048 * 26
    n_batches = 8
    idb = [jnp.asarray(((rng.random(m) ** 4.0) * 33_762_577).astype(np.int32))
           for _ in range(n_batches)]
    scb = [jnp.asarray(rng.random(m).astype(np.float32))
           for _ in range(n_batches)]

    @jax.jit
    def sortless(st, ids, sc):
        st, _ = sketch_insert(cfg, st, ids, sc)
        return st

    @jax.jit
    def sorted_precombine(st, ids, sc):
        order = jnp.argsort(ids)
        sid, ssc = ids[order], sc[order]
        first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(first) - 1
        tot = jax.ops.segment_sum(ssc, seg, num_segments=m)
        uids = jnp.where(first, sid, INVALID_ID)
        usc = jnp.where(first, tot[seg], 0.0)
        st, _ = sketch_insert(cfg, st, uids, usc)
        return st

    arms = {}
    for name, fn in (("sortless", sortless), ("sorted", sorted_precombine)):
        def run(carry, fn=fn):
            st, i = carry
            return (fn(st, idb[i % n_batches], scb[i % n_batches]), i + 1)
        arms[name] = (run, (state0, 0))
    us = interleave(arms, windows, STEPS, fence)
    return report("sortless_insert", us,
                  f"insert of {m} zipf ids, 64K buckets x 4 cells")


def decision_pallas_gather(windows):
    """4. XLA native row gather vs the Pallas deep-DMA-queue gather at
    CriteoTB row shapes (random rows, dim 128)."""
    import jax
    import jax.numpy as jnp
    from cafe_tpu.ops.pallas_gather import pallas_gather
    from cafe_tpu.utils.timing import fence

    rows, dim, b = 1 << 22, 128, 53_248  # 2 GiB f32 table, 53k rows/step
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(0, 1, (rows, dim)).astype(np.float32))
    idb = [jnp.asarray(rng.integers(0, rows, b).astype(np.int32))
           for _ in range(8)]

    @jax.jit
    def xla_step(acc, tbl, ids):
        return acc + tbl[ids].sum()

    @jax.jit
    def pallas_step(acc, tbl, ids):
        return acc + pallas_gather(tbl, ids).sum()

    arms = {}
    for name, fn in (("xla_gather", xla_step), ("pallas_gather", pallas_step)):
        def run(carry, fn=fn):
            acc, i = carry
            return (fn(acc, table, idb[i % len(idb)]), i + 1)
        arms[name] = (run, (jnp.zeros((), jnp.float32), 0))
    us = interleave(arms, windows, STEPS, fence)
    return report("pallas_gather", us,
                  f"{b} random rows of a {rows}x{dim} f32 table")


def main():
    global STEPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--decisions", nargs="*", type=int,
                    default=[1, 2, 3, 4])
    ap.add_argument("--windows", type=int, default=WINDOWS)
    ap.add_argument("--steps", type=int, default=STEPS,
                    help="steps per window (shrink for smoke tests)")
    args = ap.parse_args()
    STEPS = args.steps
    fns = {1: decision_donate, 2: decision_migration_cap,
           3: decision_sortless_insert, 4: decision_pallas_gather}
    for d in args.decisions:
        try:
            fns[d](args.windows)
        except Exception as e:  # keep the unattended sequence going
            print(json.dumps({"decision": d, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
