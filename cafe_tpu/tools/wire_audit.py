"""Wire-traffic audit CLI: compile YOUR sharded config, print every
collective with its payload, classify by mesh axis, and pass/fail the
O(batch) contract.

The test-suite version of this audit runs at fixed shapes
(tests/test_sharding.py, tests/test_mesh2.py); this tool runs the same
analysis on an arbitrary CLI configuration so deployments can check
their own method x compress-rate x mesh before committing pod time.

Usage (virtual devices, no TPU needed):
  python -m cafe_tpu.tools.wire_audit --devices 8 \
      --compress_method cafe --compress_rate 0.05 \
      --synthetic_vocab 262144 --mini_batch_size 512
  python -m cafe_tpu.tools.wire_audit --devices 8 --mesh_inner 4 \
      --shard_unique_frac 0.25 ...

Exit code 1 if any collective approaches table size.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    n_dev = 8
    if "--devices" in argv:
        i = argv.index("--devices")
        n_dev = int(argv[i + 1])
        del argv[i:i + 2]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cafe_tpu.config import parse_args
    from cafe_tpu.data import batch_iterator
    from cafe_tpu.parallel import make_mesh, shard_train_step
    from cafe_tpu.tools.hlo_traffic import classify_axis, collective_stats
    from cafe_tpu.train.loop import build_all, get_dataset

    cfg = parse_args(["--dataset", "synthetic",
                      "--shard_embeddings", "true"] + argv)
    train = get_dataset(cfg, "train")
    mesh = make_mesh(n_dev, cfg.mesh_inner)
    model, embed, state, step, _ = build_all(cfg, train, mesh=mesh)
    sharded, st = shard_train_step(step, mesh, state,
                                   shard_embeddings=True)
    dense, sparse, label, valid = next(iter(
        batch_iterator(train, cfg.mini_batch_size, drop_last=True)))
    args = (st, jnp.asarray(dense), jnp.asarray(sparse),
            jnp.asarray(label), jnp.asarray(valid))
    print("compiling sharded train step...", flush=True)
    txt = sharded.lower(*args).compile().as_text()
    stats = collective_stats(txt)
    if not stats:
        print("NO collectives found — nothing is sharded "
              "(tables too small for the mesh?)")
        return 1

    table_bytes = 0
    for part_state in st.embed.values():
        for v in part_state.values() if hasattr(part_state, "values") \
                else []:
            if getattr(v, "ndim", 0) == 2:
                table_bytes = max(table_bytes,
                                  4 * int(np.prod(v.shape)))
    m = cfg.mini_batch_size * train.num_sparse
    dense_bytes = 4 * sum(int(np.prod(l.shape))
                          for l in jax.tree.leaves(st.params))
    bound = max(8 * m * (cfg.embedding_dim + 4) * 4, 2 * dense_bytes)

    by_axis: dict = {}
    print(f"\n{'op':<22}{'bytes':>12}  axis")
    for c in sorted(stats, key=lambda c: -c.result_bytes)[:20]:
        ax = (classify_axis(c.line, cfg.mesh_inner)
              if cfg.mesh_inner else "flat")
        by_axis[ax] = by_axis.get(ax, 0) + c.result_bytes
        print(f"{c.op:<22}{c.result_bytes:>12}  {ax}")
    if len(stats) > 20:
        print(f"... {len(stats) - 20} more")
    total = sum(c.result_bytes for c in stats)
    print(f"\ntotal collective bytes/step: {total:,}")
    print(f"largest table: {table_bytes:,} B; "
          f"O(batch) per-op bound: {bound:,} B")
    if cfg.mesh_inner:
        print(f"per-axis bytes: {by_axis}")
    big = [c for c in stats if c.result_bytes > bound]
    if big:
        print(f"\nFAIL: {len(big)} collective(s) exceed the O(batch) "
              f"bound (auto-partitioner fallback / table movement):")
        for c in big[:5]:
            print(f"  {c.op}: {c.result_bytes:,} B")
        return 1
    print("\nPASS: no collective approaches table size")
    return 0


if __name__ == "__main__":
    sys.exit(main())
