"""Embedding layer construction — the dispatcher.

Mirrors the reference's EmbeddingLayer.__init__ decision tree
(init_embed.py:18-204): fields smaller than the compress threshold stay
full everywhere; each method sizes its tables with the formulas in
sizing.py. Returns a composite EmbeddingLayer of fused parts.
"""

from __future__ import annotations

import numpy as np

from .base import (
    EmbeddingLayer,
    HashedTablePart,
    MDEGroupPart,
    OffPart,
    Part,
    QRPart,
)
from .cafe import CafePart
from .ada import AdaPart
from . import sizing

__all__ = ["EmbeddingLayer", "build_embedding_layer", "HashedTablePart",
           "QRPart", "MDEGroupPart", "OffPart", "CafePart", "AdaPart",
           "Part", "sizing"]


def build_embedding_layer(cfg, counts, dim: int,
                          train_data=None) -> EmbeddingLayer:
    counts = [int(c) for c in counts]
    nf = len(counts)
    method = cfg.method
    # sparse-apply implementation override (ops/sparse.APPLY_IMPL is a
    # trace-time module switch; set before any step is traced)
    from ..ops import sparse as _sparse
    _sparse.APPLY_IMPL = getattr(cfg, "sparse_apply_impl", "auto")
    cr = cfg.compress_rate
    opt = cfg.optimizer
    th = sizing.compress_threshold(cr)
    big = [i for i in range(nf) if counts[i] > th]
    small = [i for i in range(nf) if counts[i] <= th]
    parts = []

    weighted = getattr(cfg, "weighted_pooling", "") or ""
    if weighted and method not in ("full", "hash"):
        # the reference only builds v_W_l for its plain embedding tables
        # (dlrm_s_pytorch.py:343-354); applying it to part of a compressed
        # layer would silently train a mixed model
        raise ValueError(
            f"--weighted_pooling supports methods full/hash, not {method}")

    def full_part(fields):
        if fields:
            cs = [counts[i] for i in fields]
            parts.append(HashedTablePart(fields, cs, cs, dim, opt,
                                         weighted=weighted))

    if method == "full" or not big:
        full_part(list(range(nf)))
        return EmbeddingLayer(parts, nf, dim)

    if method == "hash":
        real = [counts[i] if i in set(small)
                else int(np.ceil(counts[i] * cr)) for i in range(nf)]
        parts.append(HashedTablePart(list(range(nf)), counts, real, dim, opt,
                                     weighted=weighted))
    elif method == "qr":
        coll = sizing.qr_collisions(counts, cr)
        full_part(small)
        parts.append(QRPart(big, [counts[i] for i in big], coll, dim, opt,
                            operation=getattr(cfg, "qr_operation", "add")))
    elif method == "mde":
        dims = sizing.mde_dims(counts, cr, dim, cfg.md_round_dims)
        full_part(small)
        groups = {}
        for i in big:
            groups.setdefault(int(dims[i]), []).append(i)
        for low_dim, fields in sorted(groups.items()):
            parts.append(MDEGroupPart(fields, [counts[i] for i in fields],
                                      low_dim, dim, opt))
    elif method == "off":
        if train_data is None:
            raise ValueError("method 'off' needs the training dataset for "
                             "frequency statistics")
        from ..data.datasets import generate_hot_features
        hot_dict = generate_hot_features(train_data, cfg.data_path, th, cr,
                                         cfg.cafe_hash_rate)
        full_part(small)
        hds = [hot_dict[i] for i in big]
        ncold = [int(np.ceil(cr * cfg.cafe_hash_rate * counts[i]))
                 - int((hot_dict[i] >= 0).sum()) for i in big]
        parts.append(OffPart(big, [counts[i] for i in big], hds, ncold,
                             dim, opt))
    elif method == "cafe":
        full_part(small)
        goff = np.concatenate([[0], np.cumsum(counts)[:-1]])
        max_count = max(counts)
        sfrac = getattr(cfg, "cafe_plus_staging_frac", 0.1)
        cafe_kwargs = dict(
            plus=cfg.cafe_plus,
            adjust_threshold=cfg.cafe_adjust_threshold,
            alpha=cfg.cafe_alpha,
            mig_lanes=getattr(cfg, "cafe_mig_lanes", 256),
            plus_inherit=getattr(cfg, "cafe_plus_inherit", False),
            plus_staging_frac=sfrac,
            insert_interval=getattr(cfg, "cafe_insert_interval", 1),
            land_impl=getattr(cfg, "cafe_land_impl", "segmax"))
        if cfg.cafe_hot_separate_field:
            for i in big:
                hotn = sizing.cafe_field_hotn(counts[i], cr, dim,
                                              cfg.cafe_hash_rate)
                if hotn > 1:
                    kw = dict(cafe_kwargs)
                    if sfrac < 0:  # flow-proportional auto (sizing.py)
                        kw["plus_staging_frac"] = sizing.auto_staging_frac(
                            cfg.mini_batch_size, hotn)
                    parts.append(CafePart(
                        [i], [counts[i]], [int(goff[i])], hotn,
                        [sizing.cafe_hash_size(counts[i], cr,
                                               cfg.cafe_hash_rate)],
                        dim, cfg.cafe_sketch_threshold, cfg.cafe_decay,
                        counts[i], opt, cfg.cafe_use_freq, **kw))
                else:  # too small for a hot pool -> plain hash fallback
                    parts.append(HashedTablePart(
                        [i], [counts[i]],
                        [int(np.ceil(counts[i] * cr))], dim, opt))
        else:
            hotn = sizing.cafe_hotn(counts, cr, dim, cfg.cafe_hash_rate)
            if hotn > 1:
                if sfrac < 0:  # flow-proportional auto (sizing.py)
                    cafe_kwargs["plus_staging_frac"] = \
                        sizing.auto_staging_frac(
                            cfg.mini_batch_size * len(big), hotn)
                parts.append(CafePart(
                    big, [counts[i] for i in big],
                    [int(goff[i]) for i in big], hotn,
                    [sizing.cafe_hash_size(counts[i], cr, cfg.cafe_hash_rate)
                     for i in big],
                    dim, cfg.cafe_sketch_threshold, cfg.cafe_decay,
                    max_count, opt, cfg.cafe_use_freq, **cafe_kwargs))
            else:
                real = [int(np.ceil(counts[i] * cr)) for i in big]
                parts.append(HashedTablePart(big, [counts[i] for i in big],
                                             real, dim, opt))
    elif method == "ada":
        full_part(small)
        hotn = sizing.ada_hotn(counts, cr, dim)
        parts.append(AdaPart(big, [counts[i] for i in big], hotn, dim, opt))
    elif method == "ae":
        from .ae import AEGroupPart
        dims = sizing.mde_dims(counts, cr, dim, cfg.md_round_dims)
        full_part(small)
        groups = {}
        for i in big:
            # also bucket by vocab magnitude (factor-4 bands): the AE
            # decoder pads every field in a group to the group's max
            # vocabulary, so mixing a 10M-row field with a 100k one would
            # pay the 10M-wide one-hot for both
            mag = int(np.log2(max(counts[i], 2)) // 2)
            groups.setdefault((int(dims[i]), mag), []).append(i)
        for (low_dim, _), fields in sorted(groups.items()):
            parts.append(AEGroupPart(fields, [counts[i] for i in fields],
                                     low_dim, dim, opt))
    else:
        raise ValueError(f"unknown compress method {method}")

    return EmbeddingLayer(parts, nf, dim)
