"""Serving-path throughput: fp32 vs int8 tables at the test protocol.

The reference publishes test ms/it at batch 16384
(ArtifactEvaluation/main.py:73-81); tools/latency_grid.py measures the
fp32 path. This tool adds the quantized-serving variant so the int8
path's bandwidth claim (ops/quantized.py: ~4x smaller row reads) is a
measured number, not a docstring (VERDICT r4 stretch 10). Interleaved
fp32/int8 windows, value-fetch fenced, CriteoTB dim-128 shapes, cafe
cr=0.1.

    python tools/serving_bench.py [--windows 5] [--steps 40]
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

TEST_BATCH = 16384


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from cafe_tpu.train.step import build_quantized_eval_step
    from cafe_tpu.utils.timing import fence

    cfg = Config(dataset="criteotb", model="dlrm",
                 embedding_dim=args.dim, compress_method="cafe",
                 compress_rate=0.1, cafe_sketch_threshold=500.0,
                 cafe_hash_rate=0.5, mini_batch_size=2048,
                 learning_rate=1.0, optimizer="sgd", bf16=True)
    train_data, batches = make_criteo_batches(batch=2048, n_batches=4)
    model, embed, state, train_step, eval_step = build_all(cfg, train_data)
    # a few train steps so the sketch routes some ids hot
    for i in range(4):
        d, s, l, v = batches[i % len(batches)]
        state, m = train_step(state, d, s, l, v)
    fence(state, m)

    rng = np.random.default_rng(1)
    tb = []
    for _ in range(2):
        idx = rng.integers(0, len(train_data.sparse), TEST_BATCH)
        tb.append((jax.device_put(jnp.asarray(train_data.dense[idx])),
                   jax.device_put(jnp.asarray(train_data.sparse[idx]))))

    q_eval = build_quantized_eval_step(model, embed, state, args.bits)

    def run_fp32(i):
        return eval_step(state, *tb[i % 2])

    def run_int8(i):
        return q_eval(state, *tb[i % 2])

    for f in (run_fp32, run_int8):
        for i in range(4):
            p = f(i)
        fence(p)

    out = {"fp32": [], "int8": []}
    for _ in range(args.windows):
        for name, f in (("fp32", run_fp32), ("int8", run_int8)):
            t0 = time.perf_counter()
            for i in range(args.steps):
                p = f(i)
            fence(p)
            out[name].append(
                (time.perf_counter() - t0) / args.steps * 1e3)
    rec = {
        "metric": "serving_test_ms_per_it", "dim": args.dim,
        "test_batch": TEST_BATCH, "bits": args.bits,
        "fp32_ms": round(float(np.median(out["fp32"])), 3),
        "int8_ms": round(float(np.median(out["int8"])), 3),
        "windows": {k: [round(x, 2) for x in v] for k, v in out.items()},
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
