"""The reference's latency protocol at CriteoTB shapes, on-chip.

Reference: tasks/latency.json + main.py:420-447 — train ms/it at batch
2048 and test ms/it at batch 16384, CriteoTB arch (dim 128, big towers),
cr = 0.1, methods {hash, qr, mde, ada, cafe} (full doesn't fit the
reference's GPU and is excluded there too). CriteoTB's raw data is not
in this environment; like tools/step_breakdown.py --shapes criteotb,
the stream is the Criteo-Kaggle vocabularies (sum 33.76M) with the
criteotb tower architecture — the memory/latency-relevant shapes
(table rows x dim 128, 26 fields x 2048 lanes) match the protocol.

Timing: value-fetch fence per window (docs/PERF.md honest-clock rules),
per-step dispatch (the reference's ms/it includes its host sketch and
python loop; ours includes the dispatch). Writes one JSON line per
method to --out and a latency.json-compatible dict per method so
cafe_tpu.tools.visualization.plot_latency can render the figure.

    python tools/latency_grid.py [--out docs/r4_measurements/latency_grid.jsonl]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

TRAIN_BATCH = 2048
TEST_BATCH = 16384
METHODS = ["hash", "qr", "mde", "ada", "cafe"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/r4_measurements/latency_grid.jsonl")
    ap.add_argument("--methods", nargs="+", default=METHODS)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--boards", default="",
                    help="also write <boards>/<method>/latency.json for "
                         "visualization.plot_latency")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from cafe_tpu.utils.timing import fence

    train_data, batches = make_criteo_batches(batch=TRAIN_BATCH,
                                              n_batches=8)
    # test batches at the protocol's 16384 (gathers only)
    tb = []
    rng = np.random.default_rng(1)
    for _ in range(2):
        idx = rng.integers(0, len(train_data.sparse), TEST_BATCH)
        tb.append((jax.device_put(jnp.asarray(
                       train_data.dense[idx])),
                   jax.device_put(jnp.asarray(train_data.sparse[idx]))))

    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    for method in args.methods:
        cfg = Config(dataset="criteotb", model="dlrm", embedding_dim=128,
                     compress_method=method, compress_rate=0.1,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=TRAIN_BATCH, learning_rate=1.0,
                     optimizer="sgd", bf16=True)
        t0 = time.time()
        model, embed, state, train_step, eval_step = build_all(
            cfg, train_data)
        # warmup/compile
        for i in range(10):
            d, s, l, v = batches[i % len(batches)]
            state, m = train_step(state, d, s, l, v)
        fence(state, m)
        p = eval_step(state, *tb[0])
        fence(p)
        build_s = time.time() - t0

        tr_ms, te_ms = [], []
        for _ in range(args.windows):
            t0 = time.time()
            for i in range(args.steps):
                d, s, l, v = batches[i % len(batches)]
                state, m = train_step(state, d, s, l, v)
            fence(state, m)
            tr_ms.append((time.time() - t0) / args.steps * 1e3)
            t0 = time.time()
            for i in range(max(args.steps // 8, 8)):
                p = eval_step(state, *tb[i % len(tb)])
            fence(p)
            te_ms.append((time.time() - t0) / max(args.steps // 8, 8)
                         * 1e3)
        rec = {
            "method": method, "dim": 128, "cr": 0.1,
            "train_ms_per_it": round(float(np.median(tr_ms)), 3),
            "test_ms_per_it": round(float(np.median(te_ms)), 3),
            "train_batch": TRAIN_BATCH, "test_batch": TEST_BATCH,
            "examples_per_s": round(TRAIN_BATCH
                                    / float(np.median(tr_ms)) * 1e3),
            "windows": args.windows, "build_s": round(build_s, 1),
            "table_rows": embed.memory_rows(),
        }
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if args.boards:
            bdir = osp.join(args.boards, method)
            os.makedirs(bdir, exist_ok=True)
            # visualization.plot_latency reads {"train": ms, "test": ms}
            with open(osp.join(bdir, "latency.json"), "w") as f:
                json.dump({"train": rec["train_ms_per_it"],
                           "test": rec["test_ms_per_it"]}, f)
        del state, model, embed, train_step, eval_step


if __name__ == "__main__":
    main()
