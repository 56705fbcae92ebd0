#!/usr/bin/env python
"""Benchmark: fused DLRM+CAFE train-step throughput on one chip.

Protocol mirrors the reference's latency harness (tasks/latency.json +
main.py:420-447: train batch 2048, compress-rate in the CAFE operating
range) on Criteo-Kaggle-shaped data: the real per-field vocabulary sizes
(sum 33.76M, cited in tricks/sketchtest.py:41-45), 13 dense features,
dim 16, DLRM, CAFE cr=0.001 — the BASELINE.json headline config.

The measured step includes EVERYTHING the reference counts in its ms/it:
embedding gather + sketch query, dense fwd/bwd, BCE, grad-norm scoring,
sketch insert + promotion/migration, sparse + dense optimizer applies.
Batches are pre-staged on device (the loader's prefetch pipeline does the
same in training) and K=8 steps fuse into one dispatch — the CLI's
--steps_per_dispatch mode, bit-equal to sequential steps — so the number
measures the CHIP's fused-step throughput rather than the remote
tunnel's ~80us per-dispatch latency (through which the same chip
reports ~24M ex/s at K=1).

Baseline: the reference's single-GPU protocol on its RTX TITAN rig measures
ms/it at batch 2048; CAFE's published latency band corresponds to roughly
145K examples/s (2048 / ~14ms). vs_baseline is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# Criteo Kaggle per-field vocabulary sizes (26 fields, sum = 33,762,577)
CRITEO_COUNTS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]

BASELINE_EXAMPLES_PER_S = 145_000.0

BATCH = 2048
WARMUP = 30
STEPS = 200
WINDOWS = 5  # median-of-5 windows: the tunnel runtime is +-25% noisy
# fuse K train steps per host dispatch (the --steps_per_dispatch CLI mode;
# bit-equal to sequential steps, tests/test_train.py::TestMultiStepDispatch).
# Through the remote tunnel a single dispatch costs ~80us while the device
# step itself is ~10us, so K=8 measures the chip, not the tunnel.
DISPATCH_K = 8


def make_criteo_batches(batch: int = BATCH, n_batches: int = 8):
    """(train_data, staged device batches) at Criteo-Kaggle shapes; shared
    by bench.py and tools/step_breakdown.py so both measure the SAME
    workload."""
    import jax
    import jax.numpy as jnp
    from cafe_tpu.data.datasets import CTRArrays

    counts = np.asarray(CRITEO_COUNTS, dtype=np.int64)
    rng = np.random.default_rng(0)
    rows = batch * n_batches
    # Zipf-ish skew (u^4 concentrates mass at low ranks), then a true
    # bijective scatter (odd prime multiplier mod n) so hot ids are spread
    # over the id space like label-encoded data — a contiguous hot prefix
    # would give the gathers unrealistically good HBM locality
    sparse = np.empty((rows, len(counts)), dtype=np.int32)
    for f, n in enumerate(counts):
        u = rng.random(rows) ** 4.0
        ranks = (u * n).astype(np.int64) % n
        sparse[:, f] = (ranks * 1000000007) % n
    dense = np.log1p(rng.gamma(2.0, 2.0, (rows, 13))).astype(np.float32)
    label = rng.integers(0, 2, rows).astype(np.float32)
    train_data = CTRArrays(sparse, dense, label, counts.astype(np.int32))

    batches = []
    for b in range(n_batches):
        lo = b * batch
        batches.append((
            jax.device_put(jnp.asarray(dense[lo:lo + batch])),
            jax.device_put(jnp.asarray(sparse[lo:lo + batch])),
            jax.device_put(jnp.asarray(label[lo:lo + batch])),
            jnp.asarray(batch, jnp.int32),
        ))
    return train_data, batches


def main():
    import jax
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all

    cfg = Config(
        dataset="criteo", model="dlrm", embedding_dim=16,
        compress_method="cafe", compress_rate=0.001,
        cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
        mini_batch_size=BATCH, learning_rate=0.1, optimizer="sgd",
        bf16=True,
        # NOTE: donate_state=True measured ~30% SLOWER here (17.1M vs
        # 24.2M ex/s): on this single-chip runtime donation breaks the
        # async in-place aliasing XLA already finds, forcing synchronous
        # buffer rotation. Leave it off for the headline number.
    )
    train_data, batches = make_criteo_batches(n_batches=16)
    model, embed, state, train_step, _ = build_all(cfg, train_data)
    if DISPATCH_K > 1:
        import jax.numpy as jnp
        from cafe_tpu.train.step import build_multi_step
        train_step = build_multi_step(train_step, DISPATCH_K)
        fused = []
        for i in range(0, len(batches) - DISPATCH_K + 1, DISPATCH_K):
            grp = batches[i:i + DISPATCH_K]
            fused.append((jnp.concatenate([g[0] for g in grp]),
                          jnp.concatenate([g[1] for g in grp]),
                          jnp.concatenate([g[2] for g in grp]),
                          jnp.asarray(DISPATCH_K * BATCH, jnp.int32)))
        batches = fused

    # Steps chain through the state dependency so blocking on the final
    # loss waits for the whole pipeline. (A lax.scan-of-steps variant
    # exists but the current experimental single-chip runtime executes
    # loop bodies with per-iteration overhead ~100x the step itself; the
    # async dispatch loop measures true device throughput — verified
    # linear in step count out to 1200 steps.)

    for i in range(WARMUP):
        d, s, l, v = batches[i % len(batches)]
        state, metrics = train_step(state, d, s, l, v)
    jax.block_until_ready(metrics["loss"])

    # the remote-tunnel runtime shows +-25% window-to-window variance, so
    # a single pass over-reports by sampling a good window; measure K
    # windows and report the MEDIAN, with the spread attached
    rates = []
    for _ in range(WINDOWS):
        t0 = time.time()
        for i in range(STEPS):
            d, s, l, v = batches[i % len(batches)]
            state, metrics = train_step(state, d, s, l, v)
        jax.block_until_ready(metrics["loss"])
        rates.append(BATCH * DISPATCH_K * STEPS / (time.time() - t0))

    examples_per_s = float(np.median(rates))
    print(json.dumps({
        "metric": "dlrm_cafe_train_examples_per_s",
        "value": round(examples_per_s, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
        "window_min": round(min(rates), 1),
        "window_max": round(max(rates), 1),
        "windows": WINDOWS,
        "steps_per_dispatch": DISPATCH_K,
    }))


if __name__ == "__main__":
    main()
