"""Interleaved A/B of sparse-apply implementations at CriteoTB shapes.

The dim-128 protocol's wall is the sparse optimizer apply: XLA's
scatter-add into an HBM-resident 3.4M-row x 128 table costs ~180
ns/lane (~9.6 ms/step at 53k lanes) while XLA GATHERS the same rows at
~15 ns/row. Arms:

  scatter          sparse_sgd as-is (fresh output buffer each call)
  scatter_donated  same scatter, table donated (in-place aliasing)
  pallas           ops/pallas_apply.pallas_scatter_add — deep-queue
                   per-row read/write DMAs, MXU duplicate combine,
                   input_output_aliased (tile 256)
  pallas512        same, tile 512

Also cross-checks numerics on a small case before timing and repeats at
the dim-16 bench shapes (where the VMEM-class table makes XLA's scatter
cheap — the kernel must not regress that case's choice).

    python tools/ab_apply128.py [--windows 5] [--steps 30]
"""

import argparse
import functools
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lanes", type=int, default=53248)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cafe_tpu.ops.pallas_apply import pallas_scatter_add
    from cafe_tpu.utils.timing import fence

    rng = np.random.default_rng(0)

    # ---- numerics cross-check (small, with heavy duplicates) --------
    n, d, b = 4096, 128, 8192
    tbl = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = rng.integers(0, n, b).astype(np.int32)
    ids[: b // 4] = ids[0]  # heavy dup group
    upd = rng.normal(0, 0.01, (b, d)).astype(np.float32)
    want = tbl.copy()
    np.add.at(want, ids, upd)
    got = np.asarray(pallas_scatter_add(jnp.asarray(tbl), jnp.asarray(ids),
                                        jnp.asarray(upd)))
    err = float(np.abs(got - want).max())
    print(json.dumps({"level": "numerics", "max_abs_err": err,
                      "pass": bool(err < 1e-3)}), flush=True)
    if err >= 1e-3:
        raise SystemExit("pallas_scatter_add numerics mismatch")

    def bench_case(label, n_rows, dim, lanes):
        tbl0 = jnp.asarray(
            rng.normal(0, 1, (n_rows, dim)).astype(np.float32))
        idss = [jnp.asarray(((rng.random(lanes) ** 2) * n_rows)
                            .astype(np.int32)) for _ in range(4)]
        upds = [jnp.asarray(rng.normal(0, 1e-4, (lanes, dim))
                            .astype(np.float32)) for _ in range(4)]

        @jax.jit
        def f_scatter(t, i, u):
            return t.at[i].add(u, mode="drop")

        @functools.partial(jax.jit, donate_argnums=(0,))
        def f_scatter_don(t, i, u):
            return t.at[i].add(u, mode="drop")

        arms = {
            "scatter": lambda t, k: f_scatter(t, idss[k], upds[k]),
            "scatter_donated":
                lambda t, k: f_scatter_don(t, idss[k], upds[k]),
            "pallas": lambda t, k: pallas_scatter_add(t, idss[k], upds[k]),
            "pallas512": lambda t, k: pallas_scatter_add(
                t, idss[k], upds[k], tile=512),
        }
        # compile + warm each arm on its own copy
        tables = {}
        for name, run in list(arms.items()):
            try:
                t = tbl0 + 0
                for k in range(2):
                    t = run(t, k)
                fence(t)
                tables[name] = t
            except Exception as e:
                print(json.dumps({"level": label, "arm": name,
                                  "error": repr(e)[:300]}), flush=True)
                arms.pop(name)
        out = {k: [] for k in arms}
        for _ in range(args.windows):
            for name, run in arms.items():
                t = tables[name]
                t0 = time.perf_counter()
                for k in range(args.steps):
                    t = run(t, k % 4)
                fence(t)
                out[name].append(
                    (time.perf_counter() - t0) / args.steps * 1e6)
                tables[name] = t
        med = {k: round(float(np.median(v)), 1) for k, v in out.items()}
        print(json.dumps({"level": label, "lanes": lanes,
                          "rows": n_rows, "dim": dim, **med}), flush=True)

    # the CriteoTB protocol shapes (hash cr=0.1 table) and the dim-16
    # bench shapes
    bench_case("us_criteotb", 3376453 // 1 + 0, 128, args.lanes)
    bench_case("us_dim16", 33792, 16, args.lanes)


if __name__ == "__main__":
    main()
