"""Per-mesh-size predicted-vs-compiled collective-bytes table.

For n in {8, 64, 256} (flat) and two-level variants, compile the sharded
train step on n VIRTUAL CPU devices (no TPU needed) and compare the
compiled collectives' total result bytes against the analytic byte model
(cafe_tpu.tools.hlo_traffic.model_result_bytes == docs/PERF.md's model
in HLO-result terms). Round-3 verdict item 7: multi-chip traffic
validation without multi-chip hardware.

Each mesh size runs in a SUBPROCESS (device count is fixed at backend
init). Writes a markdown table to stdout; tee into
docs/r4_measurements/traffic_table.md.

    python tools/traffic_table.py [--method hash|cafe] [--sizes 8 64 256]
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, %(repo)r)
from cafe_tpu.config import Config
from cafe_tpu.data import batch_iterator
from cafe_tpu.parallel import make_mesh, shard_train_step
from cafe_tpu.train.loop import build_all, get_dataset
from cafe_tpu.tools.hlo_traffic import (collective_stats, classify_axis,
                                        model_result_bytes)

n = %(n)d
inner = %(inner)d
method = %(method)r
# batch must divide across the mesh; >= 2 rows per device
batch, fields, dim = max(128, 2 * n), 4, 16
cfg = Config(dataset="synthetic", embedding_dim=dim,
             compress_method=method, compress_rate=0.05,
             cafe_sketch_threshold=5.0, learning_rate=0.1,
             synthetic_rows=4096, synthetic_fields=fields,
             synthetic_vocab=2 ** 17, synthetic_dense=13,
             mini_batch_size=batch, shard_embeddings=True)
train = get_dataset(cfg, "train")
mesh = make_mesh(n, inner=inner)
model, embed, state, step, _ = build_all(cfg, train, mesh=mesh)
sharded, st = shard_train_step(step, mesh, state, shard_embeddings=True)
dense, sparse, label, valid = next(iter(
    batch_iterator(train, batch, drop_last=True)))
txt = sharded.lower(st, jnp.asarray(dense), jnp.asarray(sparse),
                    jnp.asarray(label),
                    jnp.asarray(valid)).compile().as_text()
stats = collective_stats(txt)
params = 4 * sum(l.size for l in jax.tree.leaves(st.params))
hotn = max((getattr(p, "hotn", 0) for p in embed.parts), default=0)
model_b = model_result_bytes(batch * fields, dim, n, params,
                             method=method or "hash", hotn=hotn)
per_axis = {}
if inner:
    for c in stats:
        ax = classify_axis(c.line, inner)
        per_axis[ax] = per_axis.get(ax, 0) + c.result_bytes
table_rows = max(v.shape[0] for k, v in st.embed["part0"].items()
                 if getattr(v, "ndim", 0) == 2)
print(json.dumps({
    "n": n, "inner": inner, "batch": batch, "collectives": len(stats),
    "hlo_total": sum(c.result_bytes for c in stats),
    "largest": max((c.result_bytes for c in stats), default=0),
    "model_total": model_b["total"], "model": model_b,
    "table_bytes": int(4 * dim * table_rows), "per_axis": per_axis,
}))
"""


def run_one(n, inner, method):
    env = dict(os.environ)
    kept = [t for t in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in t]
    env["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={n}"] + kept)
    env.pop("PYTHONPATH", None)
    src = _CHILD % {"repo": REPO, "n": n, "inner": inner,
                    "method": method if method != "full" else None}
    out = subprocess.run([sys.executable, "-c", src], env=env,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode:
        return {"n": n, "inner": inner, "error": out.stderr[-500:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="hash", choices=["hash", "cafe"])
    ap.add_argument("--sizes", type=int, nargs="+", default=[8, 64, 256])
    args = ap.parse_args()

    meshes = [(n, 0) for n in args.sizes]
    # two-level variants: 8 chips/host (v5e slice) under DCN
    meshes += [(n, 8) for n in args.sizes if n > 8]

    print(f"# Predicted vs compiled collective bytes — {args.method}, "
          f"batch max(128, 2n) x 4 fields, dim 16, cr 0.05, vocab 2^17\n")
    print("| mesh | batch | collectives | HLO total | model total | "
          "ratio | largest op | table | per-axis |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n, inner in meshes:
        r = run_one(n, inner, args.method)
        shape = f"{n}" if not inner else f"{n // inner}x{inner} dcn/ici"
        if "error" in r:
            print(f"| {shape} | ERROR | | | | | | | {r['error'][:80]} |")
            continue
        ratio = r["hlo_total"] / max(r["model_total"], 1)
        ax = ", ".join(f"{k} {v/1024:.0f}K" for k, v in
                       sorted(r["per_axis"].items())) or "-"
        print(f"| {shape} | {r['batch']} | {r['collectives']} | "
              f"{r['hlo_total']/1024:.0f} KB | "
              f"{r['model_total']/1024:.0f} KB | {ratio:.2f}x | "
              f"{r['largest']/1024:.0f} KB | "
              f"{r['table_bytes']/1024:.0f} KB | {ax} |")
    print("\nPASS criterion (tests/test_sharding.py::TestTrafficPrediction"
          "): 0.5x <= ratio <= 3-4x and no op near table size; the model "
          "is docs/PERF.md's byte model in HLO-result terms.")


if __name__ == "__main__":
    main()
