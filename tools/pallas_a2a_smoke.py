"""Single-device interpret=False compile smoke test for pallas_a2a.

Multi-chip hardware is not available in this environment, but Mosaic
compilability of the remote-DMA all-to-all kernel (semaphores, barrier,
collective_id, VMEM blocks) is checkable on ONE chip: at n=1 the kernel
degenerates to the local pass-through with zero remote copies, yet the
whole pallas/Mosaic lowering still runs for real (VERDICT r4 item 7).
Also compiles the n=1 sharded_fetch_a2a/sharded_apply_a2a pipeline with
impl='pallas' end to end.

    python tools/pallas_a2a_smoke.py
"""

import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cafe_tpu.ops.pallas_a2a import pallas_all_to_all

    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128), dtype=np.float32))

    out = pallas_all_to_all(x, mesh, "x", interpret=False)
    ok_kernel = bool(np.array_equal(np.asarray(out), np.asarray(x)))
    print(json.dumps({"check": "pallas_a2a_compiles_n1",
                      "pass": ok_kernel}), flush=True)

    from cafe_tpu.parallel.exchange import (sharded_apply_a2a,
                                            sharded_fetch_a2a)
    table = jnp.asarray(rng.normal(0, 1, (1024, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, (64, 4)).astype(np.int32))
    rows = sharded_fetch_a2a(mesh, table, idx, impl="pallas")
    ok_fetch = bool(np.allclose(np.asarray(rows), np.asarray(table[idx]),
                                atol=1e-6))
    grad = jnp.asarray(rng.normal(0, 1, (64, 4, 128)).astype(np.float32))
    t2, _ = sharded_apply_a2a(mesh, table, {}, idx, grad, 0.1, "sgd",
                              impl="pallas")
    want = np.array(table)   # writable copy (np.asarray of a jax array
    # is a read-only view — np.add.at needs write access)
    np.add.at(want, np.asarray(idx).reshape(-1),
              -0.1 * np.asarray(grad).reshape(-1, 128))
    ok_apply = bool(np.allclose(np.asarray(jax.device_get(t2)), want,
                                atol=1e-4))
    print(json.dumps({"check": "exchange_a2a_pallas_n1",
                      "fetch_pass": ok_fetch, "apply_pass": ok_apply}),
          flush=True)


if __name__ == "__main__":
    main()
