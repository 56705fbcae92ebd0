"""On-chip numpy-oracle check of the pallas landing kernel
(ops/pallas_land.py) — the hardware complement of
tests/test_pallas_land.py (which can only pin the CPU fallback; the
kernel's while-loop + dynamic-slice structure does not lower in
interpret mode).

Covers: bench shapes, tiny sketches, one-giant-segment, sparse jumps
crossing landing windows, all-dropped and tail-dropped lanes, b < tile,
single-lane segments, and the full sketch-insert state equality
pallas-vs-segmax at 1690 and 16896 buckets.

    python tools/pallas_land_check.py
"""

import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cafe_tpu.ops.pallas_land import pallas_land_max
    from cafe_tpu.sketch.hotsketch import (HotSketchConfig, init_sketch,
                                           sketch_insert)

    assert jax.default_backend() == "tpu", "needs the real chip"
    rng = np.random.default_rng(1)
    cases = [
        ("bench", np.sort((rng.random(53248) ** 2 * 16896)
                          .astype(np.int32)), 16896, 5),
        ("one-seg", np.zeros(53248, np.int32), 16896, 5),
        ("sparse", np.sort(rng.choice(16896, 180, replace=False)
                           .repeat(300)[:53248]).astype(np.int32),
         16896, 3),
        ("all-dropped", np.full(1024, 99999, np.int32), 512, 2),
        ("tail-dropped", np.concatenate(
            [np.sort(rng.integers(0, 500, 700)),
             np.full(324, 700, np.int32)]).astype(np.int32), 500, 3),
        ("b-lt-tile", np.sort(rng.integers(0, 100, 100))
         .astype(np.int32), 128, 4),
        ("single-lane", np.arange(4096, dtype=np.int32), 8192, 5),
        ("tiny-sketch", np.sort(rng.integers(0, 1695, 53248))
         .astype(np.int32), 1690, 5),
    ]
    failed = 0
    for name, keys, n, c in cases:
        enc = np.where(rng.random((len(keys), c)) < 0.6,
                       rng.integers(0, 1 << 30, (len(keys), c)),
                       -1).astype(np.int32)
        got = np.asarray(pallas_land_max(jnp.asarray(enc),
                                         jnp.asarray(keys), n))
        want = np.full((n, c), -1, np.int64)
        m = keys < n
        if m.any():
            np.maximum.at(want, keys[m], enc[m])
        ok = bool((got == want).all())
        failed += not ok
        print(json.dumps({"case": name, "pass": ok}), flush=True)

    for buckets in (1690, 16896):
        states = {}
        for impl in ("segmax", "pallas"):
            cfg = HotSketchConfig(buckets=buckets, threshold=50.0,
                                  land_impl=impl, max_id=1 << 26)
            st = init_sketch(cfg)
            r = np.random.default_rng(9)
            for _ in range(6):
                ids = np.minimum(r.zipf(1.2, 53248),
                                 (1 << 25)).astype(np.int32)
                sc = r.random(53248, dtype=np.float32)
                st, _ = sketch_insert(cfg, st, jnp.asarray(ids),
                                      jnp.asarray(sc))
            states[impl] = st
        eq = all((np.asarray(a) == np.asarray(b)).all()
                 for a, b in zip(states["segmax"], states["pallas"]))
        failed += not eq
        print(json.dumps({"case": f"insert_equal_{buckets}",
                          "pass": bool(eq)}), flush=True)
    if failed:
        raise SystemExit(f"{failed} case(s) failed")


if __name__ == "__main__":
    main()
