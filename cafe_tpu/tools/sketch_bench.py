"""HotSketch microbenchmark — the sketch_expr/sketchtest.py equivalent.

Three experiments on a Zipfian (or real-dataset) id stream:

1. **Recall vs ideal top-k** across memory budgets and cells-per-bucket
   (reference sweeps bucket_n in {4,8,16,32}, sketchtest.py:63-91): exact
   importance tallies on the host are the oracle; recall is the fraction of
   the ideal top-hotn ids the sketch marked hot.
2. **Throughput**: insert and query ops/s for the jitted device kernels
   (reference times the C++ loops, sketchtest.py:93-129).
3. **Temporal drift**: recall of the sketch's hot set against a *sliding
   window* top-k vs the all-history top-k (sketchtest.py:132-207), showing
   the decay mechanism tracks distribution shift.

Emits one JSON document on stdout.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def zipf_stream(n, vocab, s, seed=0):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    ids = rng.choice(vocab, size=n, p=p)
    perm = rng.permutation(vocab)
    return perm[ids].astype(np.int32)


def hot_set(state):
    dic = np.asarray(state.dic)
    val = np.asarray(state.val)
    return set(val[dic != 0].tolist())


def run_recall(stream, vocab, buckets, threshold, cells, batch):
    import jax.numpy as jnp
    from cafe_tpu.sketch import (HotSketchConfig, init_sketch,
                                 sketch_insert)
    cfg = HotSketchConfig(buckets=buckets, threshold=threshold, cells=cells)
    st = init_sketch(cfg)
    inserted = 0
    for lo in range(0, len(stream), batch):
        chunk = stream[lo:lo + batch]
        if len(chunk) < batch:
            break  # fixed-shape inserts; the tail is excluded from the
            # oracle below so the sketch is only judged on what it saw
        st, _ = sketch_insert(cfg, st, jnp.asarray(chunk),
                              jnp.ones(batch, jnp.float32))
        inserted = lo + batch
    counts = np.bincount(stream[:inserted], minlength=vocab)
    hot = hot_set(st)
    ideal = set(np.argsort(-counts)[: max(len(hot), 1)].tolist())
    return len(ideal & hot) / max(len(ideal), 1), len(hot)


def run_throughput(stream, buckets, threshold, batch):
    import jax
    import jax.numpy as jnp
    from cafe_tpu.sketch import (HotSketchConfig, init_sketch,
                                 sketch_insert, sketch_query)
    cfg = HotSketchConfig(buckets=buckets, threshold=threshold)
    st = init_sketch(cfg)
    n_chunks = min(50, len(stream) // batch)
    if n_chunks == 0:
        return 0.0, 0.0
    chunks = [jnp.asarray(stream[lo * batch:(lo + 1) * batch])
              for lo in range(n_chunks)]
    ones = jnp.ones(batch, jnp.float32)
    for c in chunks[:5]:
        st, _ = sketch_insert(cfg, st, c, ones)
    jax.block_until_ready(st.cnt)
    t0 = time.time()
    for c in chunks:
        st, _ = sketch_insert(cfg, st, c, ones)
    jax.block_until_ready(st.cnt)
    ins_ops = batch * len(chunks) / (time.time() - t0)

    q = jax.jit(lambda s, i: sketch_query(cfg, s, i))
    _ = q(st, chunks[0])
    jax.block_until_ready(_)
    t0 = time.time()
    for c in chunks:
        out = q(st, c)
    jax.block_until_ready(out)
    que_ops = batch * len(chunks) / (time.time() - t0)
    return ins_ops, que_ops


def run_drift(stream, vocab, buckets, threshold, batch, window):
    """Sliding-window vs cumulative top-k recall along the stream."""
    import jax.numpy as jnp
    from cafe_tpu.sketch import (HotSketchConfig, init_sketch,
                                 sketch_insert)
    cfg = HotSketchConfig(buckets=buckets, threshold=threshold)
    st = init_sketch(cfg)
    points = []
    stride = max(len(stream) // 5 // batch, 1) * batch
    for lo in range(0, len(stream) - batch, batch):
        chunk = stream[lo:lo + batch]
        st, _ = sketch_insert(cfg, st, jnp.asarray(chunk),
                              jnp.ones(batch, jnp.float32))
        if lo and lo % stride == 0:
            hot = hot_set(st)
            k = max(len(hot), 1)
            wslice = stream[max(0, lo - window):lo + batch]
            cum = np.bincount(stream[: lo + batch], minlength=vocab)
            win = np.bincount(wslice, minlength=vocab)
            r_cum = len(set(np.argsort(-cum)[:k].tolist()) & hot) / k
            r_win = len(set(np.argsort(-win)[:k].tolist()) & hot) / k
            points.append({"pos": lo, "recall_cumulative": round(r_cum, 4),
                           "recall_window": round(r_win, 4)})
    return points


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stream_len", type=int, default=400000)
    p.add_argument("--vocab", type=int, default=50000)
    p.add_argument("--zipf", type=float, default=1.2)
    p.add_argument("--buckets", type=int, default=2048)
    p.add_argument("--threshold", type=float, default=20.0)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--cells", type=int, nargs="+", default=[4, 8, 16, 32])
    args = p.parse_args(argv)

    stream = zipf_stream(args.stream_len, args.vocab, args.zipf)
    out = {"config": vars(args), "recall": {}, "throughput": {}}
    for cells in args.cells:
        # constant memory: cells*buckets is held fixed like the reference's
        # memory-budget sweep
        buckets = args.buckets * 4 // cells
        r, nhot = run_recall(stream, args.vocab, buckets, args.threshold,
                             cells, args.batch)
        out["recall"][f"cells{cells}"] = {"recall": round(r, 4),
                                          "hot": nhot}
    ins_ops, que_ops = run_throughput(stream, args.buckets, args.threshold,
                                      args.batch)
    out["throughput"] = {"insert_ops_per_s": round(ins_ops),
                         "query_ops_per_s": round(que_ops)}
    out["drift"] = run_drift(stream, args.vocab, args.buckets,
                             args.threshold, args.batch,
                             window=args.stream_len // 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
