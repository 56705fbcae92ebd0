#!/usr/bin/env python
"""Benchmark: fused DLRM+CAFE train-step throughput on one chip.

Protocol mirrors the reference's latency harness (tasks/latency.json +
main.py:420-447: train batch 2048, compress-rate in the CAFE operating
range) on Criteo-Kaggle-shaped data: the real per-field vocabulary sizes
(sum 33.76M, cited in tricks/sketchtest.py:41-45), 13 dense features,
dim 16, DLRM, CAFE cr=0.001 — the BASELINE.json headline config.

The HEADLINE is the reference-exact semantics: sketch insert after every
backward (cafe_insert_interval=1, ArtifactEvaluation/main.py:376).
Secondary fields in the same JSON line report the measured envelope:
interval-8 (the amortized-insert perf knob), cr=1e-4 (worst-case
compression), and the CriteoTB dim-128 protocol shapes.

The measured step includes EVERYTHING the reference counts in its ms/it:
embedding gather + sketch query, dense fwd/bwd, BCE, grad-norm scoring,
sketch insert + promotion/migration, sparse + dense optimizer applies.
Batches are pre-staged on device (the loader's prefetch pipeline does the
same in training) and K=8 steps fuse into one dispatch — the CLI's
--steps_per_dispatch mode, bit-equal to sequential steps.

HONEST CLOCK (round-3 fix): every timed window ends with a VALUE FETCH
of a checksum depending on every leaf of the final state + metrics
(cafe_tpu/utils/timing.fence), matching the reference's
cuda.synchronize-bracketed contract (ArtifactEvaluation/main.py:385-391).
`jax.block_until_ready` is NOT trusted on this runtime: round 2's
128.3M ex/s headline measured the tunnel's RPC enqueue rate (it implied
363 TFLOP/s of matmul on a 197-TFLOP/s chip). As a guard, the bench
computes the step's analytic matmul FLOPs and REFUSES to report any
number whose implied MFU exceeds 1.0. Validate the clock itself with
tools/clock_probe.py (known-FLOPs matmul chain).

Baseline: the reference's single-GPU protocol on its RTX TITAN rig measures
ms/it at batch 2048; CAFE's published latency band corresponds to roughly
145K examples/s (2048 / ~14ms). vs_baseline is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.
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

# bf16 matmul peak by device_kind; conservative default for unknown chips.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}
DEFAULT_PEAK = 197e12


def step_flops_per_example(cfg, num_dense: int, num_sparse: int) -> float:
    """Analytic matmul FLOPs per example of the DLRM train step (fwd ~2
    MAC-FLOPs per weight; backward ~2x fwd). Embedding gathers/scatters
    and the sketch are memory ops, not counted — this is deliberately a
    LOWER bound so the MFU guard can never be argued down."""
    from cafe_tpu.train.loop import model_arch
    ln_bot, ln_top = model_arch(cfg, num_dense, num_sparse)
    macs = sum(a * b for a, b in zip(ln_bot, ln_bot[1:]))
    macs += sum(a * b for a, b in zip(ln_top, ln_top[1:]))
    num_fea = num_sparse + 1
    macs += num_fea * num_fea * cfg.embedding_dim  # dot interaction bmm
    return 3.0 * 2.0 * macs  # fwd + ~2x bwd

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
    # Device-init watchdog: when the TPU tunnel is unreachable,
    # jax.devices() blocks indefinitely in native code (observed: hours
    # during round 3). Fail fast with a diagnosable JSON line instead of
    # hanging the calling harness.
    import json as _json
    import os as _os
    import threading as _th
    watchdog = _th.Timer(600.0, lambda: (
        print(_json.dumps({
            "metric": "dlrm_cafe_train_examples_per_s", "value": 0,
            "unit": "examples/s/chip", "vs_baseline": 0,
            "error": "device init exceeded 600s — TPU tunnel unreachable",
        }), flush=True),
        _os._exit(3)))
    watchdog.daemon = True
    watchdog.start()

    import jax
    from cafe_tpu.config import Config
    from cafe_tpu.train.loop import build_all
    jax.devices()          # force backend init under the watchdog
    watchdog.cancel()

    import jax.numpy as jnp
    from cafe_tpu.train.step import build_multi_step
    from cafe_tpu.utils.timing import fence

    def measure(cfg, train_data, batches, windows=WINDOWS, steps=STEPS,
                dispatch_k=DISPATCH_K, batch=BATCH):
        """Median examples/s over `windows` fenced windows for one config.

        Steps chain through the state dependency, so a value fetch of a
        checksum over the FINAL state + metrics forces the device to have
        executed the whole chain (cafe_tpu/utils/timing.fence). This is
        the honest clock; block_until_ready is not trusted on this
        runtime."""
        model, embed, state, train_step, _ = build_all(cfg, train_data)
        if dispatch_k > 1:
            train_step = build_multi_step(train_step, dispatch_k,
                                          donate=cfg.donate_state)
            fused = []
            for i in range(0, len(batches) - dispatch_k + 1, dispatch_k):
                grp = batches[i:i + dispatch_k]
                fused.append((jnp.concatenate([g[0] for g in grp]),
                              jnp.concatenate([g[1] for g in grp]),
                              jnp.concatenate([g[2] for g in grp]),
                              jnp.asarray(dispatch_k * batch, jnp.int32)))
            batches = fused

        for i in range(WARMUP):
            d, s, l, v = batches[i % len(batches)]
            state, metrics = train_step(state, d, s, l, v)
        fence(state, metrics)

        # the remote-tunnel runtime shows +-25% window-to-window variance,
        # so a single pass over-reports by sampling a good window; measure
        # K windows and report the MEDIAN, with the spread attached
        rates = []
        for _ in range(windows):
            t0 = time.time()
            for i in range(steps):
                d, s, l, v = batches[i % len(batches)]
                state, metrics = train_step(state, d, s, l, v)
            fence(state, metrics)
            rates.append(batch * dispatch_k * steps / (time.time() - t0))
        del state, metrics
        return float(np.median(rates)), rates

    # ---- headline: the REFERENCE-EXACT config — sketch insert after
    # every backward (cafe_insert_interval=1, matching
    # ArtifactEvaluation/main.py:376 feeding the sketch each step), dim 16,
    # CAFE cr=1e-3, the BASELINE.json headline operating point.
    cfg = Config(
        dataset="criteo", model="dlrm", embedding_dim=16,
        compress_method="cafe", compress_rate=0.001,
        cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
        mini_batch_size=BATCH, learning_rate=0.1, optimizer="sgd",
        bf16=True, cafe_insert_interval=1,
        # donate_state A/B'd on the honest clock (docs/PERF.md): no
        # significant difference at these table shapes; left default.
    )
    train_data, batches = make_criteo_batches(n_batches=16)
    examples_per_s, rates = measure(cfg, train_data, batches)

    flops_ex = step_flops_per_example(cfg, 13, len(CRITEO_COUNTS))
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, DEFAULT_PEAK)
    mfu = examples_per_s * flops_ex / peak
    if mfu > 1.0:
        import sys
        print(f"REFUSING to report: measured {examples_per_s:.3e} ex/s x "
              f"{flops_ex:.3e} FLOP/ex = {examples_per_s * flops_ex / 1e12:.0f} "
              f"TFLOP/s exceeds the chip's {peak / 1e12:.0f} TFLOP/s peak "
              f"(implied MFU {mfu:.2f} > 1). The clock is broken — see "
              f"tools/clock_probe.py.", file=sys.stderr)
        raise SystemExit(1)

    # ---- secondary operating points (same JSON line, round-4 verdict
    # items 1a/9: the envelope, not just the best point). Each is a
    # shorter 3-window run; failures degrade to null rather than killing
    # the headline.
    extras = {}

    def try_extra(name, cfg_x, data_x, batches_x, **kw):
        try:
            v, _ = measure(cfg_x, data_x, batches_x, windows=3, **kw)
            extras[name] = round(v, 1)
        except Exception as e:  # pragma: no cover - defensive on-chip
            import sys
            print(f"extra '{name}' failed: {e!r}", file=sys.stderr)
            extras[name] = None

    import dataclasses
    # (a) the amortized-insert perf knob (cafe_insert_interval=8): the
    # round-4 headline config. AUC-neutral at cr=1e-3 (docs/
    # EXPERIMENTS.md), NOT reference-exact — reported for comparison.
    try_extra("interval8_examples_per_s",
              dataclasses.replace(cfg, cafe_insert_interval=8),
              train_data, batches)
    # (b) worst-case compression (cr=1e-4, interval 1).
    try_extra("cr1e4_examples_per_s",
              dataclasses.replace(cfg, compress_rate=0.0001),
              train_data, batches)
    # (c) the reference's CriteoTB protocol shapes (dim 128, cr=0.1,
    # big towers, lr 1.0 — tasks/latency.json); per-step dispatch since
    # the step dwarfs dispatch overhead at these shapes.
    cfg128 = Config(
        dataset="criteotb", model="dlrm", embedding_dim=128,
        compress_method="cafe", compress_rate=0.1,
        cafe_sketch_threshold=500.0, cafe_hash_rate=0.5,
        mini_batch_size=BATCH, learning_rate=1.0, optimizer="sgd",
        bf16=True, cafe_insert_interval=1)
    try_extra("dim128_examples_per_s", cfg128, train_data, batches,
              steps=100, dispatch_k=1)

    print(json.dumps({
        "metric": "dlrm_cafe_train_examples_per_s",
        "value": round(examples_per_s, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
        "window_min": round(min(rates), 1),
        "window_max": round(max(rates), 1),
        "windows": WINDOWS,
        "steps_per_dispatch": DISPATCH_K,
        "mfu": round(mfu, 4),
        "flops_per_example": flops_ex,
        "cafe_insert_interval": 1,
        **extras,
        "sync": "value-fetch fence (utils/timing.py)",
    }))


if __name__ == "__main__":
    main()
