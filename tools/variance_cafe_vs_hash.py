"""Multi-seed variance for the headline cafe-vs-hash AUC separation.

Runs the docs/EXPERIMENTS.md stationary-grid config (Zipf 1.2 stream,
cr = 0.003) across seeds and prints mean ± std test AUC per method, so the
documented +1.1-point CAFE advantage carries an error bar.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import dataclasses

    import jax.numpy as jnp
    from cafe_tpu.config import Config
    from cafe_tpu.data import batch_iterator, make_synthetic_arrays
    from cafe_tpu.data.datasets import CTRArrays
    from cafe_tpu.train.loop import build_all, inference

    seeds = [11, 23, 37]
    res = {"hash": [], "cafe": []}
    for seed in seeds:
        data = make_synthetic_arrays(rows=120000, fields=6, vocab=30000,
                                     dense=8, zipf=1.2, seed=seed)
        cut = len(data) * 6 // 7
        d = data.dense
        train = CTRArrays(data.sparse[:cut], d[:cut], data.label[:cut],
                          data.counts)
        test = CTRArrays(data.sparse[cut:], d[cut:], data.label[cut:],
                         data.counts)
        base = Config(dataset="synthetic", embedding_dim=16,
                      learning_rate=0.1, compress_rate=0.003,
                      cafe_sketch_threshold=30, cafe_hash_rate=0.3,
                      mini_batch_size=256, test_mini_batch_size=16384,
                      numpy_rand_seed=seed)
        for method in ("hash", "cafe"):
            cfg = dataclasses.replace(base, compress_method=method)
            model, embed, state, ts, es = build_all(cfg, train)
            for _ in range(2):
                for dense, sparse, label, valid in batch_iterator(
                        train, 256, drop_last=True):
                    state, _ = ts(state, jnp.asarray(dense),
                                  jnp.asarray(sparse), jnp.asarray(label),
                                  valid)
            m, _ = inference(cfg, es, state, test)
            res[method].append(m["roc_auc"])
            print(f"seed {seed} {method}: auc {m['roc_auc']:.4f}",
                  flush=True)

    for method, aucs in res.items():
        print(f"{method}: {np.mean(aucs):.4f} +- {np.std(aucs):.4f}")
    gap = np.asarray(res["cafe"]) - np.asarray(res["hash"])
    print(f"cafe - hash gap: {gap.mean():.4f} +- {gap.std():.4f} "
          f"(per-seed: {[round(g, 4) for g in gap]})")


if __name__ == "__main__":
    main()
