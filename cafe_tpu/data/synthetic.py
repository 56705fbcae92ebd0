"""Synthetic Zipfian CTR streams — the test backbone.

The reference keeps an (unreachable) synthetic path, RandomDataset +
distribution generators (dlrm_data_pytorch.py:759-1157); here synthetic data
is a first-class citizen: every unit/integration test and the benchmark can
fabricate a Criteo-shaped stream with a controllable skew, and the generator
can also *write* the binary dataset format so the whole preprocessing →
training path is exercised without the real 60 GB datasets.

CTR id streams are heavily skewed (the whole premise of CAFE); a Zipf(s)
draw over each field's vocabulary is the standard model for that.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from .datasets import CTRArrays


def _zipf_ids(rng: np.random.Generator, n: int, vocab: int,
              s: float) -> np.ndarray:
    """Zipf-distributed ids in [0, vocab) via inverse-CDF on ranks.

    Ranks are then permuted (seeded by vocab) so hot ids are scattered over
    the id space like real label-encoded data rather than clustered at 0.
    """
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-s)
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    u = rng.random(n)
    idx = np.searchsorted(cdf, u).astype(np.int64)
    perm = np.random.RandomState(vocab % (2**31 - 1)).permutation(vocab)
    return perm[np.minimum(idx, vocab - 1)].astype(np.int32)


def make_synthetic_arrays(rows: int = 65536, fields: int = 8,
                          vocab: int = 100000, dense: int = 13,
                          zipf: float = 1.05, seed: int = 0,
                          label_from_ids: bool = True) -> CTRArrays:
    """Build an in-memory CTR dataset.

    If `label_from_ids`, labels correlate with a fixed random per-id logit so
    a model can actually learn (AUC > 0.5) — needed for end-to-end learning
    tests; otherwise labels are fair coin flips.
    """
    rng = np.random.default_rng(seed)
    counts = np.full(fields, vocab, dtype=np.int32)
    sparse = np.stack(
        [_zipf_ids(rng, rows, vocab, zipf) for _ in range(fields)], axis=1
    )
    dense_arr = None
    if dense > 0:
        dense_arr = np.log1p(rng.gamma(2.0, 2.0, size=(rows, dense))
                             ).astype(np.float32)
    if label_from_ids:
        id_logit = rng.normal(0.0, 1.0, size=(fields, vocab)).astype(np.float32)
        logits = np.zeros(rows, dtype=np.float32)
        for f in range(fields):
            logits += id_logit[f, sparse[:, f]]
        logits /= np.sqrt(fields)
        p = 1.0 / (1.0 + np.exp(-logits))
        label = (rng.random(rows) < p).astype(np.int32)
    else:
        label = (rng.random(rows) < 0.5).astype(np.int32)
    return CTRArrays(sparse.astype(np.int32), dense_arr, label, counts)


def write_synthetic_dataset(path: str, **kwargs) -> CTRArrays:
    """Write a synthetic dataset in the reference binary format."""
    os.makedirs(path, exist_ok=True)
    a = make_synthetic_arrays(**kwargs)
    a.sparse.tofile(osp.join(path, "processed_sparse_sep.bin"))
    if a.dense is not None:
        a.dense.tofile(osp.join(path, "processed_dense.bin"))
    a.label.astype(np.int32).tofile(osp.join(path, "processed_label.bin"))
    a.counts.tofile(osp.join(path, "processed_count.bin"))
    return a
