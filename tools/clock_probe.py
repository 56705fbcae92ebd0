#!/usr/bin/env python
"""Known-FLOPs probe validating the timing clock on this runtime.

Two patterns, each with two sync styles:
  scan:  ONE dispatch containing a lax.scan of K dependent matmuls
  chain: K separate dispatches of a jitted matmul, data-chained in Python
         (bench.py's pattern: N train_step dispatches, sync once at end)

Each 4096^3 bf16 matmul is 2*4096^3 FLOPs; K=50. Reported TFLOP/s must
never exceed the chip's bf16 peak (~197 on TPU v5e / "TPU v5 lite").
Round-2 verdict: `jax.block_until_ready` on the axon tunnel runtime can
return without awaiting queued dispatches, inflating chained-dispatch
rates ~1000x. An honest clock must end each window with a VALUE FETCH
(np.asarray / float) of a result that transitively depends on all timed
work.

Usage: python tools/clock_probe.py   (run from repo root, no PYTHONPATH)
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 4096
    K = 50
    flops = K * 2 * N**3

    @jax.jit
    def scan_chain(x):
        def body(c, _):
            return c @ c * 0.001, None
        y, _ = jax.lax.scan(body, x, None, length=K)
        return y

    @jax.jit
    def one(x):
        return x @ x * 0.001

    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N)) * 0.01,
                    jnp.bfloat16)
    x = jax.device_put(x)

    # warmup + compile both
    _ = np.asarray(scan_chain(x)[0, :8])
    _ = np.asarray(one(x)[0, :8])

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    def run(pattern):
        if pattern == "scan":
            return scan_chain(x)
        y = x
        for _ in range(K):
            y = one(y)
        return y

    for pattern in ("scan", "chain"):
        for name, sync in [
            ("block_until_ready", lambda r: jax.block_until_ready(r)),
            ("value_fetch", lambda r: np.asarray(r[0, :8])),
        ]:
            rates = []
            for _ in range(3):
                t0 = time.time()
                r = run(pattern)
                sync(r)
                dt = time.time() - t0
                rates.append(flops / dt / 1e12)
            print(f"{pattern:5s} {name:17s}: "
                  f"{min(rates):8.1f} - {max(rates):8.1f} TFLOP/s")


if __name__ == "__main__":
    main()
