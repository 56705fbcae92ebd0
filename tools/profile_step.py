"""Profile the bench-protocol train step and print where the time goes.

Runs N fused dispatches of the bench.py workload under `jax.profiler.trace`
(SURVEY §5 tracing parity: the reference wraps its loop in
torch.autograd.profiler and exports a Chrome trace,
dlrm_s_pytorch.py:1576-1578), then parses the exported Chrome trace and
aggregates complete ('X') events per thread — on TPU the device lanes
carry one event per XLA fusion, so the top-k table is the stage budget
the MFU work needs (VERDICT r3 item: profile, then push toward the
matmul roofline).

Run from the repo root WITHOUT PYTHONPATH:
    python tools/profile_step.py [--steps 30] [--top 25] [--out DIR]
The raw trace stays in DIR (default /tmp/cafe_profile) for tensorboard.
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import sys
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def newest_trace(trace_dir):
    paths = glob.glob(osp.join(trace_dir, "plugins", "profile", "*",
                               "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def summarize(trace_path, top):
    raw = json.loads(gzip.open(trace_path).read())
    events = raw.get("traceEvents", [])
    tname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    # total + count per (thread, op-name) over complete events
    agg = defaultdict(lambda: [0.0, 0])
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        key = (e.get("pid"), e.get("tid"))
        thread = tname.get(key, f"{key}")
        agg[(thread, e["name"])][0] += e["dur"]
        agg[(thread, e["name"])][1] += 1
        tot[thread] += e["dur"]
    # device lanes first (TPU traces name them like '/device:TPU:0 ...'
    # or 'TensorFlow Op'/XLA Ops'); host python lanes last
    def is_device(t):
        t = t.lower()
        return any(s in t for s in ("tpu", "xla op", "device", "step"))

    threads = sorted(tot, key=lambda t: (not is_device(t), -tot[t]))
    for t in threads:
        rows = sorted(((v[0], v[1], n) for (th, n), v in agg.items()
                       if th == t), reverse=True)[:top]
        if not rows:
            continue
        print(f"\n== thread: {t or '(unnamed)'}  total {tot[t]/1e3:.2f} ms")
        for dur, cnt, name in rows:
            print(f"  {dur/1e3:9.3f} ms  x{cnt:<5d} {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30,
                    help="fused K=8 dispatches to profile (after warmup)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/cafe_profile")
    ap.add_argument("--parse_only", default="",
                    help="skip running; parse this trace dir")
    args = ap.parse_args()

    if args.parse_only:
        summarize(newest_trace(args.parse_only), args.top)
        return

    import jax
    import jax.numpy as jnp
    from bench import BATCH, DISPATCH_K, make_criteo_batches
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    from cafe_tpu.train.step import build_multi_step
    from cafe_tpu.utils.timing import fence

    cfg = Config(dataset="criteo", model="dlrm", embedding_dim=16,
                 compress_method="cafe", compress_rate=0.001,
                 cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                 mini_batch_size=BATCH, learning_rate=0.1,
                 optimizer="sgd", bf16=True)
    train_data, batches = make_criteo_batches(n_batches=16)
    model, embed, state, step, _ = build_all(cfg, train_data)
    multi = build_multi_step(step, DISPATCH_K)
    fused = []
    for i in range(0, len(batches) - DISPATCH_K + 1, DISPATCH_K):
        grp = batches[i:i + DISPATCH_K]
        fused.append((jnp.concatenate([g[0] for g in grp]),
                      jnp.concatenate([g[1] for g in grp]),
                      jnp.concatenate([g[2] for g in grp]),
                      jnp.asarray(DISPATCH_K * BATCH, jnp.int32)))

    for i in range(10):
        d, s, l, v = fused[i % len(fused)]
        state, m = multi(state, d, s, l, v)
    fence(state, m)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            d, s, l, v = fused[i % len(fused)]
            state, m = multi(state, d, s, l, v)
        fence(state, m)
    print(f"trace written to {args.out}")
    summarize(newest_trace(args.out), args.top)


if __name__ == "__main__":
    main()
