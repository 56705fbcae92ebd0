"""Find a robust synthetic config where CAFE's AUC advantage over plain
hashing shows at unit-test scale (for tests/test_train.py)."""
import dataclasses
import itertools
import os.path as osp
import sys

# run as `python tools/sweep_cafe_vs_hash.py`; do NOT use PYTHONPATH —
# the TPU tunnel plugin fails to register if it is set
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from cafe_tpu.config import Config
from cafe_tpu.data import make_synthetic_arrays, batch_iterator
from cafe_tpu.data.datasets import CTRArrays
from cafe_tpu.train.loop import build_all, inference


def split(data, frac=6 / 7):
    cut = int(len(data) * frac)
    d = data.dense
    return (CTRArrays(data.sparse[:cut], None if d is None else d[:cut],
                      data.label[:cut], data.counts),
            CTRArrays(data.sparse[cut:], None if d is None else d[cut:],
                      data.label[cut:], data.counts))


def train_eval(cfg, train, test, epochs, batch=256):
    model, embed, state, ts, es = build_all(cfg, train)
    m = {}
    for _ in range(epochs):
        for dense, sparse, label, valid in batch_iterator(
                train, batch, drop_last=True):
            dx = None if dense is None else jnp.asarray(dense)
            state, m = ts(state, dx, jnp.asarray(sparse),
                          jnp.asarray(label), valid)
    metrics, _ = inference(cfg, es, state, test)
    return metrics["roc_auc"], {k: float(v) for k, v in m.items()
                                if k.startswith("cafe")}


def main():
    grids = itertools.product(
        [1.2, 1.35],          # zipf
        [0.003, 0.01],        # cr
        [5.0, 20.0],          # threshold
        [8, 10],              # epochs
    )
    for zipf, cr, th, epochs in grids:
        for seed in [7, 8]:
            data = make_synthetic_arrays(rows=60000, fields=4, vocab=20000,
                                         dense=4, zipf=zipf, seed=seed)
            train, test = split(data)
            base = Config(dataset="synthetic", embedding_dim=16,
                          learning_rate=0.1, compress_rate=cr,
                          cafe_sketch_threshold=th, cafe_hash_rate=0.3,
                          test_mini_batch_size=4096)
            res = {}
            for method in ["hash", "cafe"]:
                cfg = dataclasses.replace(base, compress_method=method)
                auc, extra = train_eval(cfg, train, test, epochs)
                res[method] = auc
            print(f"zipf={zipf} cr={cr} th={th} ep={epochs} seed={seed} "
                  f"hash={res['hash']:.4f} cafe={res['cafe']:.4f} "
                  f"delta={res['cafe'] - res['hash']:+.4f} {extra}",
                  flush=True)


if __name__ == "__main__":
    main()
