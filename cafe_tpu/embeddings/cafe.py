"""CAFE embedding: HotSketch-routed hot/cold dual tables, fully on-device.

Reference behavior (ArtifactEvaluation/embeddings/sk_embedding_bag.py):
  forward   query sketch with field-offset ids; negative result = hot slot in
            the shared hot table, else hash into the per-field cold table,
            blend with a mask (:96-120).
  backward  per-sample importance = L2 norm of the gradient of whichever row
            served the sample, normalized to mean 1 over the batch (:155-162);
            fed to the sketch; ids newly promoted copy their cold row into
            their fresh hot row ("embedding migration", :168-180).

Differences by design:
  * The whole path (query -> gather -> blend -> grad-norm -> insert ->
    migrate -> sparse update) is inside one jitted step; the reference pays
    two ctypes crossings + four host<->device copies per field per step.
  * One sketch insert handles ALL fields' ids at once (global offset ids are
    disjoint across fields) instead of 26 sequential C++ calls.
  * The hot table and the per-field hash tables live in ONE device array
    (hot rows first, hash rows at `hash_base`). The reference gathers BOTH
    tables for every sample and blends with torch.where
    (sk_embedding_bag.py:102-118) — three passes over batch*dim; here the
    routed row index makes the forward a single gather and the backward a
    single scatter, which the roofline tool shows running at HBM
    speed-of-light.
  * Migration row choice: the reference migrates from weight_hash[raw_id %
    hash_size] (sk_embedding_bag.py:179) while its forward used
    offset_id % hash_size (:108-113) — an inconsistency that copies an
    unrelated row whenever offset % hash_size != 0. We use the forward's row
    (offset id) for both, i.e. the row that actually served the feature.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..sketch.hotsketch import (
    HotSketchConfig,
    init_sketch,
    sketch_insert,
    sketch_query,
)
from ..sketch.hotsketch_plus import (
    CafePlusConfig,
    init_sketch_plus,
    sketch_insert_plus,
    sketch_query_plus,
)
from .base import Part, _offsets, round_up


class CafePart(Part):
    def __init__(self, field_idx: List[int], counts: List[int],
                 global_offsets: List[int], hotn: int,
                 hash_sizes: List[int], dim: int,
                 sketch_threshold: float, sketch_decay: float,
                 max_count: int, optimizer: str = "sgd",
                 use_freq: bool = False, plus: bool = False,
                 adjust_threshold: bool = True, alpha: float = 1.000001):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.global_offsets = [int(o) for o in global_offsets]
        self.hotn = int(hotn)
        self.hash_sizes = [int(h) for h in hash_sizes]
        self.dim = dim
        self.optimizer = optimizer
        self.use_freq = use_freq
        self.max_count = int(max_count)  # max vocab across ALL fields
        self.hash_off = _offsets(self.hash_sizes)
        self.hash_rows = int(sum(self.hash_sizes))
        # unified layout: [0, hotn) hot rows, [hash_base, ...) hash rows
        self.hash_base = round_up(self.hotn)
        self.total_rows = self.hash_base + round_up(self.hash_rows)
        self.plus = plus
        if plus:
            self.sketch_cfg = CafePlusConfig(
                lim=self.hotn, threshold=float(sketch_threshold),
                alpha=float(alpha), adjust_threshold=adjust_threshold)
            self._sk_init = init_sketch_plus
            self._sk_query = sketch_query_plus
            self._sk_insert = sketch_insert_plus
        else:
            self.sketch_cfg = HotSketchConfig(
                buckets=self.hotn, threshold=float(sketch_threshold),
                decay=float(sketch_decay))
            self._sk_init = init_sketch
            self._sk_query = sketch_query
            self._sk_insert = sketch_insert

    def init(self, rng: np.random.Generator) -> Dict:
        table = np.zeros((self.total_rows, self.dim), dtype=np.float32)
        high_scale = np.sqrt(1.0 / self.max_count)  # init_embed.py:119
        table[: self.hotn] = rng.uniform(
            -high_scale, high_scale,
            size=(self.hotn, self.dim)).astype(np.float32)
        lo = self.hash_base
        for n, hs in zip(self.counts, self.hash_sizes):
            scale = np.sqrt(1.0 / n)  # sk_embedding_bag.py:92-94
            table[lo:lo + hs] = rng.uniform(
                -scale, scale, size=(hs, self.dim)).astype(np.float32)
            lo += hs
        state = {
            "table": jnp.asarray(table),
            "sketch": self._sk_init(self.sketch_cfg),
        }
        return self._maybe_acc(state, "table")

    def _oids(self, ids: jnp.ndarray) -> jnp.ndarray:
        goff = jnp.asarray(self.global_offsets, dtype=jnp.int32)
        return ids + goff[None, :]

    def _rows(self, oids, is_hot, slot):
        """Unified row index: hot slot or hash_base + per-field hash row."""
        hsz = jnp.asarray(self.hash_sizes, dtype=jnp.int32)
        hoff = jnp.asarray(self.hash_off, dtype=jnp.int32)
        hrow = (oids % hsz[None, :]) + hoff[None, :] + self.hash_base
        return jnp.where(is_hot, slot, hrow), hrow

    def gather(self, state: Dict, ids: jnp.ndarray):
        b, f = ids.shape
        oids = self._oids(ids)
        q = self._sk_query(self.sketch_cfg, state["sketch"],
                           oids.reshape(-1)).reshape(b, f)
        is_hot = q < 0
        slot = jnp.where(is_hot, -q, 0)
        row, hrow = self._rows(oids, is_hot, slot)
        raw = state["table"][row]
        return raw, (oids, row, hrow, is_hot)

    def apply_grads(self, state: Dict, ids: jnp.ndarray, g_raw: jnp.ndarray,
                    aux, lr: float):
        oids, row, hrow, is_hot = aux
        b, f, d = g_raw.shape

        # importance scores (sk_embedding_bag.py:155-162): per-field batch
        # L2 norms normalized to mean 1; frequency mode uses all-ones.
        if self.use_freq:
            scores = jnp.ones((b, f), jnp.float32)
        else:
            norms = jnp.sqrt(jnp.sum(g_raw * g_raw, axis=-1) + 1e-30)
            scores = norms * b / (jnp.sum(norms, axis=0, keepdims=True)
                                  + 1e-30)

        sk, promo = self._sk_insert(self.sketch_cfg, state["sketch"],
                                    oids.reshape(-1), scores.reshape(-1))

        # compact the promotion lanes before computing migration rows: the
        # v1 sketch reports candidates over the [B*cells] grid but a single
        # insert can promote at most hotn-1 ids (the free-slot bound), so a
        # cumsum scatter-compaction to [hotn] lanes is lossless and cuts the
        # migration gather/scatter work by ~B*cells/hotn
        L = promo.ids.shape[0]
        cap = min(L, self.hotn)
        if cap < L:
            rank = jnp.cumsum(promo.mask.astype(jnp.int32)) - 1
            pos = jnp.where(promo.mask, jnp.clip(rank, 0, cap - 1), cap)
            p_ids = jnp.zeros(cap + 1, jnp.int32).at[pos].set(
                promo.ids, mode="drop")[:cap]
            p_slots = jnp.zeros(cap + 1, jnp.int32).at[pos].set(
                promo.slots, mode="drop")[:cap]
            p_mask = jnp.zeros(cap + 1, bool).at[pos].set(
                promo.mask, mode="drop")[:cap]
        else:
            p_ids, p_slots, p_mask = promo.ids, promo.slots, promo.mask

        # migration BEFORE the optimizer touches the cold rows, matching the
        # reference's insert_grad-then-step ordering (main.py:376-377).
        goff = jnp.asarray(self.global_offsets, dtype=jnp.int32)
        hsz = jnp.asarray(self.hash_sizes, dtype=jnp.int32)
        hoff = jnp.asarray(self.hash_off, dtype=jnp.int32)
        pfield = jnp.clip(
            jnp.searchsorted(goff, p_ids, side="right") - 1,
            0, len(self.field_idx) - 1)
        prow = jnp.clip((p_ids % hsz[pfield]) + hoff[pfield],
                        0, self.hash_rows - 1) + self.hash_base
        dst = jnp.where(p_mask, p_slots, self.total_rows)
        table = state["table"].at[dst].set(state["table"][prow],
                                           mode="drop")
        state = {**state, "table": table, "sketch": sk}

        # one scatter updates whichever row served each sample
        state = self._table_update(state, "table", row.reshape(-1),
                                   g_raw.reshape(b * f, d), lr)

        stats = {
            "cafe_promotions": promo.mask.sum(),
            "cafe_hot_frac": is_hot.mean(),
        }
        return state, stats

    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        return {"table": self._quantize(state["table"], bits)}

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        """Same sketch routing as gather; row fetch dequantizes on-chip.
        The sketch (int/bookkeeping state) stays full precision."""
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        oids = self._oids(ids)
        q = self._sk_query(self.sketch_cfg, state["sketch"],
                           oids.reshape(-1)).reshape(b, f)
        is_hot = q < 0
        row, _ = self._rows(oids, is_hot, jnp.where(is_hot, -q, 0))
        return dequantize_rows(qt["table"], row.reshape(-1)).reshape(
            b, f, -1)

    def on_load(self, state: Dict) -> Dict:
        """Post-checkpoint-restore hook. Full sketch state is checkpointed
        (CAFE+ behavior, PinSAGE/sketch.cpp:333-402) so nothing to rebuild;
        kept for API parity with init_embed.py:225-227."""
        return state

    # -- views kept for tests/diagnostics ------------------------------
    def high_view(self, state: Dict) -> jnp.ndarray:
        return state["table"][: self.hotn]

    def hash_view(self, state: Dict) -> jnp.ndarray:
        return state["table"][self.hash_base:
                              self.hash_base + self.hash_rows]
