"""Measure the fixed per-XLA-kernel overhead on this chip/runtime.

The insert profile (docs/r5_measurements/profile_insert.txt) shows
dozens of elementwise fusions over ~1 MB arrays costing 50-150 us each
— 25-75x their bandwidth cost (~2 us at 819 GB/s). If per-kernel fixed
overhead dominates, the optimization lever for the whole fused step is
KERNEL COUNT, not bytes or flops. This probe chains k unfusable
elementwise kernels (optimization_barrier between them) over a [4, 53248]
f32 array inside ONE jit and reports us/kernel from the slope between
k=16 and k=128 (subtracting dispatch/fence constants), for several
array shapes.

    python tools/kernel_overhead_probe.py
"""

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from cafe_tpu.utils.timing import fence

    def chain(k, shape):
        def f(x):
            for i in range(k):
                x = jax.lax.optimization_barrier(x * 1.000001 + 1e-7)
            return x.sum()
        return jax.jit(f), jnp.ones(shape, jnp.float32)

    results = {}
    for shape in [(4, 53248), (8, 53248), (53248,), (256, 256),
                  (33792, 8)]:
        times = {}
        for k in (16, 128):
            f, x = chain(k, shape)
            r = f(x)
            fence(r)
            meds = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(10):
                    r = f(x)
                fence(r)
                meds.append((time.perf_counter() - t0) / 10 * 1e6)
            times[k] = float(np.median(meds))
        per_kernel = (times[128] - times[16]) / (128 - 16)
        mb = float(np.prod(shape)) * 4 / 1e6
        results[str(shape)] = {
            "us_k16": round(times[16], 1), "us_k128": round(times[128], 1),
            "us_per_kernel": round(per_kernel, 2),
            "bandwidth_us_expected": round(mb * 2 / 819e3 * 1e6, 2),
        }
        print(json.dumps({"shape": str(shape), **results[str(shape)]}),
              flush=True)


if __name__ == "__main__":
    main()
