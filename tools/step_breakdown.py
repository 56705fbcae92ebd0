"""Per-stage timing of the fused train step on the real chip.

Times the full CAFE step against ablations (hash = no sketch/migration,
full = uncompressed tables, fwd-only = no backward/update) at the bench.py
protocol shapes to show where the step budget goes.
"""

import os.path as osp
import sys
import time

import numpy as np

# run as `python tools/step_breakdown.py`; NOTE: do NOT use PYTHONPATH for
# this — the axon TPU plugin's tunnel subprocess inherits it and fails to
# register the backend.
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timed(fn, state, batches, steps=300, warmup=20):
    # honest clock: value-fetch fence over EVERY leaf of the last output
    # (passed-through state included — for fwd-only fns the predictions
    # carry the dependence); block_until_ready is not trusted here (see
    # cafe_tpu/utils/timing.py and tools/clock_probe.py)
    from cafe_tpu.utils.timing import fence as sync

    for i in range(warmup):
        d, s, l, v = batches[i % len(batches)]
        out = fn(state, d, s, l, v)
        state = out[0] if isinstance(out, tuple) else state
    sync(out)
    t0 = time.time()
    st = state
    for i in range(steps):
        d, s, l, v = batches[i % len(batches)]
        out = fn(st, d, s, l, v)
        if isinstance(out, tuple):
            st = out[0]
    sync(out)
    return (time.time() - t0) / steps * 1e6  # us/step


def main():
    import argparse

    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from bench import BATCH, make_criteo_batches

    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", choices=["criteo", "criteotb"],
                    default="criteo",
                    help="criteo: dim 16 bench protocol; criteotb: dim 128"
                         " + the big towers at cr=0.1 (the latency-"
                         "protocol config that exposed the migration-cap"
                         " win, docs/PERF.md)")
    args = ap.parse_args()

    train_data, batches = make_criteo_batches()

    if args.shapes == "criteotb":
        grid = [("cafe", "cafe", 0.1), ("hash", "hash", 0.1)]
        dim, dataset = 128, "criteotb"
    else:
        # cafe_iv8 is the bench.py protocol (insert_interval=8, AUC-
        # neutral at cr>=1e-3 per docs/criteo_grid_r4.jsonl); cafe is
        # the every-step reference semantics
        grid = [("cafe", "cafe", 0.001), ("cafe_iv8", "cafe", 0.001),
                ("hash", "hash", 0.001), ("full", None, 1.0)]
        dim, dataset = 16, "criteo"

    results = {}
    for name, method, cr in grid:
        cfg = Config(dataset=dataset, model="dlrm", embedding_dim=dim,
                     compress_method=method, compress_rate=cr,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=BATCH, learning_rate=0.1,
                     optimizer="sgd", bf16=True,
                     cafe_insert_interval=8 if name.endswith("iv8") else 1)
        import jax.numpy as jnp
        import jax
        model, embed, state, train_step, eval_step = build_all(
            cfg, train_data)
        # train_step donates its state input (config default); hand the
        # timing loop a COPY so `state` stays alive for the fwd arm
        results[name] = timed(train_step, jax.tree.map(jnp.copy, state),
                              batches)

        def fwd_only(st, d, s, l, v):
            return (st, eval_step(st, d, s))
        results[name + "_fwd"] = timed(fwd_only, state, batches)
        del state

    for k, v in results.items():
        print(f"{k:12s} {v:8.1f} us/step  "
              f"({BATCH / v * 1e6 / 1e6:.1f}M ex/s)")
    print(f"sketch+migration overhead: "
          f"{results['cafe'] - results['hash']:.1f} us "
          f"({(results['cafe'] - results['hash']) / results['cafe'] * 100:.0f}% of cafe step)")
    if "cafe_iv8" in results:
        ov = results["cafe_iv8"] - results["hash"]
        print(f"  at the bench protocol (insert_interval=8): {ov:.1f} us "
              f"({ov / results['cafe_iv8'] * 100:.0f}% of cafe step)")


if __name__ == "__main__":
    main()
