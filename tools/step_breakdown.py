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
    import jax
    for i in range(warmup):
        d, s, l, v = batches[i % len(batches)]
        out = fn(state, d, s, l, v)
        state = out[0] if isinstance(out, tuple) else state
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    st = state
    for i in range(steps):
        d, s, l, v = batches[i % len(batches)]
        out = fn(st, d, s, l, v)
        if isinstance(out, tuple):
            st = out[0]
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / steps * 1e6  # us/step


def main():
    import jax
    import jax.numpy as jnp
    from cafe_tpu.config import Config
    from cafe_tpu.data.datasets import CTRArrays
    from cafe_tpu.train.loop import build_all
    from bench import CRITEO_COUNTS, BATCH

    counts = np.asarray(CRITEO_COUNTS, dtype=np.int64)
    rng = np.random.default_rng(0)
    rows = BATCH * 8
    sparse = np.empty((rows, len(counts)), dtype=np.int32)
    for f, n in enumerate(counts):
        u = rng.random(rows) ** 4.0
        sparse[:, f] = (u * n).astype(np.int64) % n
    dense = np.log1p(rng.gamma(2.0, 2.0, (rows, 13))).astype(np.float32)
    label = rng.integers(0, 2, rows).astype(np.float32)
    train_data = CTRArrays(sparse, dense, label, counts.astype(np.int32))

    batches = []
    for b in range(rows // BATCH):
        lo = b * BATCH
        batches.append((
            jax.device_put(jnp.asarray(dense[lo:lo + BATCH])),
            jax.device_put(jnp.asarray(sparse[lo:lo + BATCH])),
            jax.device_put(jnp.asarray(label[lo:lo + BATCH])),
            jnp.asarray(BATCH, jnp.int32),
        ))

    results = {}
    for name, method, cr in [("cafe", "cafe", 0.001),
                             ("hash", "hash", 0.001),
                             ("full", None, 1.0)]:
        cfg = Config(dataset="criteo", model="dlrm", embedding_dim=16,
                     compress_method=method, compress_rate=cr,
                     cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
                     mini_batch_size=BATCH, learning_rate=0.1,
                     optimizer="sgd", bf16=True)
        model, embed, state, train_step, eval_step = build_all(
            cfg, train_data)
        results[name] = timed(train_step, state, batches)

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


if __name__ == "__main__":
    main()
