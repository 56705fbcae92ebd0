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
                 adjust_threshold: bool = True, alpha: float = 1.000001,
                 mig_lanes: int = 256, plus_inherit: bool = False,
                 plus_staging_frac: float = 0.1, insert_interval: int = 1,
                 land_impl: str = "segmax"):
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
        # per-shard migration lane budget in the sharded step: promotions
        # beyond this per step are REVERTED losslessly (slot returned, cell
        # de-promoted; the id re-promotes on its next touch) so the
        # migration exchange stays a small fixed size
        self.mig_lanes = int(mig_lanes)
        # insert grad-norm scores into the sketch every k-th step (scores
        # scaled by k so the expected per-wall-step mass — and thus
        # threshold/decay cadence — is preserved). 1 = reference-exact
        # (insert after every backward, main.py:376). The sketch only
        # drives promotion timing/routing, not the loss; the 1/k time
        # subsample is AUC-neutral at cr >= ~1e-3 but mis-ranks tiny hot
        # sets at cr = 1e-4 (-2.1 AUC pts; A/B table in
        # docs/EXPERIMENTS.md) — a perf knob for moderate compression,
        # cutting the insert (the costliest non-matmul op in the fused
        # step, docs/r4_measurements/) by ~k.
        self.insert_interval = max(int(insert_interval), 1)
        self.n_shards = 1
        if plus:
            from ..sketch.hotsketch_plus import revert_promotions_plus
            self.sketch_cfg = CafePlusConfig(
                lim=self.hotn, threshold=float(sketch_threshold),
                alpha=float(alpha), adjust_threshold=adjust_threshold,
                inherit=plus_inherit,
                staging_frac=float(plus_staging_frac))
            self._sk_init = init_sketch_plus
            self._sk_query = sketch_query_plus
            self._sk_insert = sketch_insert_plus
            self._sk_revert = revert_promotions_plus
        else:
            from ..sketch.hotsketch import revert_promotions
            # exclusive bound on offset ids this part can insert — lets
            # the landing pack (cell, id) into one channel when < 2^27
            max_oid = max(o + n for o, n in zip(self.global_offsets,
                                               self.counts))
            self.sketch_cfg = HotSketchConfig(
                buckets=self.hotn, threshold=float(sketch_threshold),
                decay=float(sketch_decay), land_impl=land_impl,
                max_id=int(max_oid))
            self._sk_init = init_sketch
            self._sk_query = sketch_query
            self._sk_insert = sketch_insert
            self._sk_revert = revert_promotions

    def enable_mesh(self, mesh) -> bool:
        """Opt into the explicit SPMD exchange with a SHARD-LOCAL sketch:
        ids route to shards by hash(id) % n, each shard runs the unchanged
        kernel (v1 or CAFE+) on its own bucket/free-list slice with its
        own adaptive threshold, promotions stay device-local (SURVEY.md §7
        'Multi-host sketch semantics'). Must be called BEFORE init()."""
        from ..sketch.sharded import local_config, local_config_plus
        n = int(mesh.devices.size)
        if self.total_rows % n:
            return False
        try:
            if self.plus:
                lcfg, s_l = local_config_plus(self.sketch_cfg, n)
            else:
                lcfg, s_l = local_config(self.sketch_cfg, n)
        except ValueError:
            return False
        if s_l < 2:
            return False
        self.mesh = mesh
        self.n_shards = n
        self._lcfg = lcfg
        self._s_l = s_l
        return True

    def enable_sharded_layout(self, n: int) -> bool:
        """Adopt the n-shard STATE LAYOUT without a mesh, so a checkpoint
        trained with enable_mesh(n) can be loaded and served on a single
        chip (quantize_for_serving + gather_quantized route through the
        sharded sketch views by n_shards, not by mesh). Training paths
        still require the mesh; only serving/inspection are supported in
        this mode. Must be called BEFORE init()/checkpoint restore."""
        from ..sketch.sharded import local_config, local_config_plus
        n = int(n)
        if n <= 1 or self.total_rows % n:
            return False
        try:
            if self.plus:
                lcfg, s_l = local_config_plus(self.sketch_cfg, n)
            else:
                lcfg, s_l = local_config(self.sketch_cfg, n)
        except ValueError:
            return False
        if s_l < 2:
            return False
        self.n_shards = n
        self._lcfg = lcfg
        self._s_l = s_l
        return True

    def init(self, rng: np.random.Generator) -> Dict:
        table = np.zeros((self.total_rows, self.dim), dtype=np.float32)
        high_scale = np.sqrt(1.0 / self.max_count)  # init_embed.py:119
        # sharded mode can allocate slots up to the padded hot region (the
        # rows exist either way); initialize the whole region it may serve
        sharded = self.mesh is not None or self.n_shards > 1
        n_hot_init = self.hash_base if sharded else self.hotn
        table[: n_hot_init] = rng.uniform(
            -high_scale, high_scale,
            size=(n_hot_init, self.dim)).astype(np.float32)
        lo = self.hash_base
        for n, hs in zip(self.counts, self.hash_sizes):
            scale = np.sqrt(1.0 / n)  # sk_embedding_bag.py:92-94
            table[lo:lo + hs] = rng.uniform(
                -scale, scale, size=(hs, self.dim)).astype(np.float32)
            lo += hs
        if sharded:
            from ..sketch.sharded import (init_sharded_sketch,
                                          init_sharded_sketch_plus)
            init_fn = init_sharded_sketch_plus if self.plus \
                else init_sharded_sketch
            sketch = init_fn(self.sketch_cfg, self.n_shards)
        else:
            sketch = self._sk_init(self.sketch_cfg)
        state = {
            "table": jnp.asarray(table),
            "sketch": sketch,
            # step counter for insert_interval (checkpointed so resume
            # keeps the insert phase; harmless scalar at interval 1)
            "tick": jnp.zeros((), jnp.int32),
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
        if self.mesh is not None:
            return self._gather_sharded(state, ids)
        b, f = ids.shape
        oids = self._oids(ids)
        if self.n_shards > 1:
            # mesh-less sharded LAYOUT (enable_sharded_layout): route the
            # query through the sharded sketch views on one device
            from ..sketch.sharded import query_sharded, query_sharded_plus
            qfn = query_sharded_plus if self.plus else query_sharded
            q = qfn(self.sketch_cfg, self.n_shards, state["sketch"],
                    oids.reshape(-1)).reshape(b, f)
        else:
            q = self._sk_query(self.sketch_cfg, state["sketch"],
                               oids.reshape(-1)).reshape(b, f)
        is_hot = q < 0
        slot = jnp.where(is_hot, -q, 0)
        row, hrow = self._rows(oids, is_hot, slot)
        raw = state["table"][row]
        return raw, (oids, row, hrow, is_hot)

    def _gather_sharded(self, state: Dict, ids: jnp.ndarray):
        """Explicit SPMD forward: all_gather the int32 offset ids, each
        sketch shard answers hot-routing for the ids it owns, an int32
        psum publishes the global row map, then an owner-compute gather +
        psum_scatter returns each device its batch shard's rows. Traffic
        per device: ~M*4*(n-1)/n (ids) + 2*M*4*(n-1)/n (row psum) +
        M*D*4*(n-1)/n (rows) — O(batch), never O(table)."""
        import jax
        from jax.sharding import PartitionSpec as P
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import mesh_axes
        from ..sketch.hotsketch import INVALID_ID
        from ..sketch.sharded import (shard_local_view, shard_of,
                                      sketch_partition_specs)

        AXIS = mesh_axes(self.mesh)
        n, s_l, lcfg = self.n_shards, self._s_l, self._lcfg
        hsz = jnp.asarray(self.hash_sizes, dtype=jnp.int32)
        hoff = jnp.asarray(self.hash_off, dtype=jnp.int32)
        oids = self._oids(ids)
        sk = state["sketch"]
        sk_specs = sketch_partition_specs(sk, AXIS)

        goff = jnp.asarray(self.global_offsets, dtype=jnp.int32)
        two_level = len(AXIS) == 2

        def _answer(sk_g, cand, me):
            """Row map for a candidate id list: each sketch shard answers
            the ids it owns, an int32 psum over the mesh publishes."""
            mine = shard_of(cand, n) == me
            q_ids = jnp.where(mine, cand, INVALID_ID)
            q = self._sk_query(lcfg, shard_local_view(sk_g), q_ids)
            slot_g = jnp.where(mine & (q < 0), -q + me * s_l, 0)
            slot_all = jax.lax.psum(slot_g, AXIS)
            pf = jnp.clip(jnp.searchsorted(goff, cand, side="right") - 1,
                          0, len(self.field_idx) - 1)
            hrow = (cand % hsz[pf]) + hoff[pf] + self.hash_base
            return jnp.where(slot_all > 0, slot_all, hrow), slot_all > 0

        def route(sk_g, oids_l):
            # ROUTING ONLY (id-sized traffic): each sketch shard answers
            # hot-routing for the ids it owns; the int32 psum publishes
            # the global row map. The D-wide ROW VALUES move separately
            # through exchange.sharded_fetch, which is hierarchical on a
            # two-level mesh and unique-compacting when
            # shard_unique_frac > 0 — CAFE's heavy leg rides the same
            # optimized exchange as every other method.
            bl, fl = oids_l.shape
            m = bl * fl
            me = jax.lax.axis_index(AXIS)

            def flat_route(_):
                all_oids = jax.lax.all_gather(oids_l.reshape(m), AXIS,
                                              tiled=True)
                row_all, hot_all = _answer(sk_g, all_oids, me)
                row_me = jax.lax.dynamic_slice(row_all, (me * m,), (m,))
                hot_me = jax.lax.dynamic_slice(
                    hot_all.astype(jnp.int32), (me * m,), (m,)) > 0
                return row_me, hot_me

            if not two_level:
                row_me, hot_me = flat_route(None)
                return row_me.reshape(bl, fl), hot_me.reshape(bl, fl)

            # hierarchical id leg: combine distinct ids within the host
            # before they cross DCN (only the compact unique set moves)
            from ..ops.sparse import unique_compact
            from ..parallel.exchange import unique_cap
            dcn_ax, ici_ax = AXIS
            n_ici = self.mesh.shape[ici_ax]
            m_host = m * n_ici
            C = unique_cap(m_host, self.unique_frac)
            if not C:
                row_me, hot_me = flat_route(None)
                return row_me.reshape(bl, fl), hot_me.reshape(bl, fl)
            me_c = jax.lax.axis_index(ici_ax)
            me_h = jax.lax.axis_index(dcn_ax)
            ici_ids = jax.lax.all_gather(oids_l.reshape(m), ici_ax,
                                         tiled=True)
            uids, inv, nu = unique_compact(ici_ids, C, int(INVALID_ID))
            over = jax.lax.pmax(nu, AXIS) > C

            def compact_fn(_):
                cand = jax.lax.all_gather(uids, dcn_ax, tiled=True)
                row_all, hot_all = _answer(sk_g, cand, me)
                inv_me = jax.lax.dynamic_slice(inv, (me_c * m,), (m,))
                pos = me_h * C + jnp.clip(inv_me, 0, C - 1)
                return row_all[pos], hot_all[pos]

            row_me, hot_me = jax.lax.cond(over, flat_route, compact_fn,
                                          None)
            return row_me.reshape(bl, fl), hot_me.reshape(bl, fl)

        row, is_hot = shard_map(
            route, self.mesh,
            in_specs=(sk_specs, P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None)),
        )(sk, oids)
        raw = self._sharded_fetch(state["table"], row)
        return raw, (oids, row, is_hot)

    def apply_grads(self, state: Dict, ids: jnp.ndarray, g_raw: jnp.ndarray,
                    aux, lr: float):
        if self.mesh is not None:
            return self._apply_sharded(state, ids, g_raw, aux, lr)
        if self.n_shards > 1:
            # enable_sharded_layout is serving/inspection-only: the flat
            # insert path applied to the sharded sketch layout would
            # mis-hash buckets and silently corrupt promotions/counters.
            raise RuntimeError(
                "CafePart: training in sharded-layout mode requires the "
                "mesh (enable_mesh); enable_sharded_layout supports "
                "serving/inspection only")
        oids, row, hrow, is_hot = aux
        b, f, d = g_raw.shape
        flat_oids = oids.reshape(-1)
        interval = self.insert_interval

        def insert_and_compact(sketch_in):
            """Score -> insert -> lossless promotion cap -> fixed-lane
            compaction. Returns (sketch, p_ids, p_slots, p_mask) with the
            report compacted to a static lane count so it can live on
            either side of the insert-interval lax.cond."""
            # importance scores (sk_embedding_bag.py:155-162): per-field
            # batch L2 norms normalized to mean 1; frequency mode uses
            # all-ones. Scaled by insert_interval so a 1/k time subsample
            # contributes the same expected mass per wall-step.
            if self.use_freq:
                scores = jnp.full((b, f), float(interval), jnp.float32)
            else:
                norms = jnp.sqrt(jnp.sum(g_raw * g_raw, axis=-1) + 1e-30)
                scores = norms * (b * interval) / (
                    jnp.sum(norms, axis=0, keepdims=True) + 1e-30)
            sk, promo = self._sk_insert(self.sketch_cfg, sketch_in,
                                        flat_oids, scores.reshape(-1))

            # compact the promotion lanes before computing migration rows:
            # the v1 sketch reports candidates over the [B*cells] grid, so
            # without a cap the migration gather/scatter runs over L lanes
            # of dim-wide rows (at CriteoTB shapes, 213k x 128 x 4B x 2 ~
            # 218 MB/step — measured 43% of the whole step). Cap at
            # mig_lanes and REVERT the excess promotions losslessly (slot
            # returned, cell de-promoted; the id re-promotes on its next
            # touch) — the same mechanism the sharded path uses to bound
            # its migration exchange.
            L = promo.ids.shape[0]
            cap = min(L, self.hotn, max(self.mig_lanes * 16, 4096))
            mask = promo.mask
            if cap < L:
                rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
                excess = mask & (rank >= cap)
                sk = self._sk_revert(self.sketch_cfg, sk, flat_oids, promo,
                                     excess)
                mask = mask & ~excess
                pos = jnp.where(mask, jnp.clip(rank, 0, cap - 1), cap)
                p_ids = jnp.zeros(cap + 1, jnp.int32).at[pos].set(
                    promo.ids, mode="drop")[:cap]
                p_slots = jnp.zeros(cap + 1, jnp.int32).at[pos].set(
                    promo.slots, mode="drop")[:cap]
                p_mask = jnp.zeros(cap + 1, bool).at[pos].set(
                    mask, mode="drop")[:cap]
            else:
                p_ids, p_slots, p_mask = promo.ids, promo.slots, mask
            return sk, p_ids, p_slots, p_mask

        if interval > 1:
            import jax
            # static lane count of the compacted report: L lanes from the
            # sketch (v1 compacts to PROMO_LANES, CAFE+ reports [B]),
            # further capped by the migration budget
            from ..sketch.hotsketch import PROMO_LANES
            L0 = flat_oids.shape[0] if self.plus \
                else min(flat_oids.shape[0], PROMO_LANES)
            cap_l = min(L0, self.hotn, max(self.mig_lanes * 16, 4096))

            def skip(sketch_in):
                return (sketch_in,
                        jnp.zeros(cap_l, jnp.int32),
                        jnp.zeros(cap_l, jnp.int32),
                        jnp.zeros(cap_l, bool))

            sk, p_ids, p_slots, p_mask = jax.lax.cond(
                state["tick"] % interval == 0,
                insert_and_compact, skip, state["sketch"])
        else:
            sk, p_ids, p_slots, p_mask = insert_and_compact(
                state["sketch"])

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
        state = {**state, "table": table, "sketch": sk,
                 "tick": state.get("tick", jnp.zeros((), jnp.int32)) + 1}
        # freshly promoted slots restart their optimizer state (stale
        # adagrad acc would permanently shrink the new occupant's lr; the
        # reference's full-tensor torch state has the same staleness and
        # simply lives with it — deviation documented in docs/GUIDE.md)
        from ..ops.sparse import SLOT_SUFFIXES
        for sfx in SLOT_SUFFIXES[self.optimizer].values():
            k = "table" + sfx
            if state[k].ndim == 2:
                state[k] = state[k].at[dst].set(0.0, mode="drop")

        # one scatter updates whichever row served each sample
        state = self._table_update(state, "table", row.reshape(-1),
                                   g_raw.reshape(b * f, d), lr)

        stats = {
            "cafe_promotions": p_mask.sum(),
            "cafe_hot_frac": is_hot.mean(),
        }
        return state, stats

    def _apply_sharded(self, state: Dict, ids: jnp.ndarray,
                       g_raw: jnp.ndarray, aux, lr: float):
        """Explicit SPMD backward: shard-local sketch insert (each shard
        inserts only the ids it owns, with its OWN free list — promotion
        decisions never serialize through a global stack), lossless
        overflow-revert promotion capping, a bounded migration exchange
        (n*mig_lanes rows), then dedup + owner-compute sparse update via
        exchange.sharded_apply (hierarchical + unique-compacting)."""
        import jax
        from jax.sharding import PartitionSpec as P
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (DROP_ROW, _local_idx,
                                         _owner_rows, mesh_axes,
                                         slot_specs)
        from ..sketch.hotsketch import INVALID_ID
        from ..sketch.sharded import shard_of

        AXIS = mesh_axes(self.mesh)

        oids, row, is_hot = aux
        b, f, d = g_raw.shape
        n, s_l, lcfg = self.n_shards, self._s_l, self._lcfg
        p_cap = min(self.mig_lanes, max(s_l - 1, 1))
        goff = jnp.asarray(self.global_offsets, dtype=jnp.int32)
        hsz = jnp.asarray(self.hash_sizes, dtype=jnp.int32)
        hoff = jnp.asarray(self.hash_off, dtype=jnp.int32)

        # importance scores — identical math to the single-device path
        # (including the insert_interval mass scaling)
        interval = self.insert_interval
        if self.use_freq:
            scores = jnp.full((b, f), float(interval), jnp.float32)
        else:
            norms = jnp.sqrt(jnp.sum(g_raw * g_raw, axis=-1) + 1e-30)
            scores = norms * (b * interval) / (
                jnp.sum(norms, axis=0, keepdims=True) + 1e-30)
        # replicated predicate: every device takes the same branch, so a
        # lax.cond whose insert branch contains collectives is legal under
        # shard_map (same pattern as the unique-compact `over` cond)
        do_insert = (state.get("tick", jnp.zeros((), jnp.int32))
                     % interval == 0) if interval > 1 else None

        sk = state["sketch"]
        from ..sketch.sharded import (shard_global_view, shard_local_view,
                                      sketch_partition_specs)
        sk_specs = sketch_partition_specs(sk, AXIS)
        slots_in = self._slots_of(state, "table")
        sl_specs = slot_specs(slots_in, AXIS)

        two_level = len(AXIS) == 2

        def f(tbl, sl, sk_g, oids_l, sc_l, do_l):
            # SKETCH + MIGRATION ONLY: id/score traffic (4B lanes) plus
            # the bounded n*p_cap*D migration exchange. The batch's
            # D-wide row updates ride exchange.sharded_apply afterwards
            # — hierarchical on a two-level mesh, unique-compacting when
            # shard_unique_frac > 0.
            bl, fl = oids_l.shape
            m = bl * fl
            me = jax.lax.axis_index(AXIS)
            rows_l = tbl.shape[0]

            def insert_leg(cand, cand_sc):
                """Insert a candidate (id, score) list into the
                shard-local sketch; promotions capped at p_cap and
                compacted to fixed lanes (shape-independent of len(cand),
                so the flat and hierarchical branches can share a
                lax.cond)."""
                mine = shard_of(cand, n) == me
                q_ids = jnp.where(mine, cand, INVALID_ID)
                st = shard_local_view(sk_g)
                st, promo = self._sk_insert(lcfg, st, q_ids, cand_sc)
                rank = jnp.cumsum(promo.mask.astype(jnp.int32)) - 1
                excess = promo.mask & (rank >= p_cap)
                st = self._sk_revert(lcfg, st, q_ids, promo, excess)
                keep = promo.mask & ~excess
                pos = jnp.where(keep, jnp.clip(rank, 0, p_cap - 1), p_cap)
                cp_ids = jnp.full(p_cap + 1, INVALID_ID,
                                  jnp.int32).at[pos].set(
                    promo.ids, mode="drop")[:p_cap]
                cp_slot = jnp.zeros(p_cap + 1, jnp.int32).at[pos].set(
                    promo.slots + me * s_l, mode="drop")[:p_cap]
                cp_mask = jnp.zeros(p_cap + 1, bool).at[pos].set(
                    keep, mode="drop")[:p_cap]
                return (st, cp_ids, cp_slot, cp_mask,
                        keep.sum(dtype=jnp.int32))

            def flat_leg(_):
                all_oids = jax.lax.all_gather(oids_l.reshape(m), AXIS,
                                              tiled=True)
                all_sc = jax.lax.all_gather(sc_l.reshape(m), AXIS,
                                            tiled=True)
                return insert_leg(all_oids, all_sc)

            def run_insert(_):
                hier = False
                if two_level:
                    from ..ops.sparse import coalesce_compact
                    from ..parallel.exchange import unique_cap
                    dcn_ax, ici_ax = AXIS
                    n_ici = self.mesh.shape[ici_ax]
                    C = unique_cap(m * n_ici, self.unique_frac)
                    hier = bool(C)
                if not hier:
                    return flat_leg(None)
                # hierarchical (id, score-sum) leg: duplicates combine
                # within the host before crossing DCN (score sums are
                # exactly what the insert segment-sums anyway)
                ici_ids = jax.lax.all_gather(oids_l.reshape(m), ici_ax,
                                             tiled=True)
                ici_sc = jax.lax.all_gather(sc_l.reshape(m), ici_ax,
                                            tiled=True)
                uids, usc, nu = coalesce_compact(
                    ici_ids, ici_sc[:, None], C, int(INVALID_ID))
                over = jax.lax.pmax(nu, AXIS) > C

                def compact_leg(_):
                    cand = jax.lax.all_gather(uids, dcn_ax, tiled=True)
                    cand_sc = jax.lax.all_gather(usc[:, 0], dcn_ax,
                                                 tiled=True)
                    return insert_leg(cand, cand_sc)

                return jax.lax.cond(over, flat_leg, compact_leg, None)

            if interval > 1:
                # lax.cond under shard_map demands identical varying-
                # manual-axes types across branches; constants (and some
                # post-collective values) trace as replicated, so cast
                # every branch output to device-varying uniformly
                axes = AXIS if isinstance(AXIS, tuple) else (AXIS,)

                def _vary(x):
                    vma = getattr(jax.typeof(x), "vma", frozenset())
                    miss = tuple(a for a in axes if a not in vma)
                    return jax.lax.pvary(x, miss) if miss else x

                def skip_leg(_):
                    return jax.tree.map(_vary, (
                        shard_local_view(sk_g),
                        jnp.full(p_cap, INVALID_ID, jnp.int32),
                        jnp.zeros(p_cap, jnp.int32),
                        jnp.zeros(p_cap, bool),
                        jnp.int32(0)))

                st, cp_ids, cp_slot, cp_mask, n_keep = jax.lax.cond(
                    do_l, lambda o: jax.tree.map(_vary, run_insert(o)),
                    skip_leg, None)
            else:
                st, cp_ids, cp_slot, cp_mask, n_keep = run_insert(None)

            gp_ids = jax.lax.all_gather(cp_ids, AXIS, tiled=True)
            gp_slot = jax.lax.all_gather(cp_slot, AXIS, tiled=True)
            gp_mask = jax.lax.all_gather(cp_mask, AXIS, tiled=True)

            # ---- migration: cold-row owners contribute, psum, hot-row
            # owners write (bounded n*p_cap*D exchange)
            pf = jnp.clip(jnp.searchsorted(goff, gp_ids, side="right") - 1,
                          0, fl - 1)
            src_row = jnp.clip((gp_ids % hsz[pf]) + hoff[pf],
                               0, self.hash_rows - 1) + self.hash_base
            src_row = jnp.where(gp_mask, src_row, DROP_ROW)
            mig = jax.lax.psum(_owner_rows(tbl, src_row, AXIS), AXIS)
            dst = jnp.where(gp_mask, gp_slot, DROP_ROW)
            dst_l = _local_idx(rows_l, dst, AXIS)
            tbl = tbl.at[dst_l].set(mig.astype(tbl.dtype), mode="drop")
            # promoted slots restart optimizer state (see single-dev path)
            sl = {k: (v.at[dst_l].set(0.0, mode="drop")
                      if getattr(v, "ndim", 0) == 2 else v)
                  for k, v in sl.items()}

            n_promo = jax.lax.psum(n_keep, AXIS)
            return tbl, sl, shard_global_view(st), n_promo

        table, slots_mig, new_sk, n_promo = shard_map(
            f, self.mesh,
            in_specs=(P(AXIS, None), sl_specs, sk_specs,
                      P(AXIS, None), P(AXIS, None), P()),
            out_specs=(P(AXIS, None), sl_specs, sk_specs, P()),
        )(state["table"], slots_in, sk, oids, scores,
          do_insert if do_insert is not None else jnp.bool_(True))

        # ---- row updates: migration happens BEFORE the optimizer touch
        # (reference insert_grad-then-step order, main.py:376-377);
        # sharded_apply dedups per device and is hierarchical/compacting
        table, slots_out = self._sharded_apply(table, slots_mig, row,
                                               g_raw, lr)

        out = self._put_slots(
            {**state, "table": table, "sketch": new_sk,
             "tick": state.get("tick", jnp.zeros((), jnp.int32)) + 1},
            "table", slots_out)
        stats = {
            "cafe_promotions": n_promo,
            "cafe_hot_frac": is_hot.mean(),
        }
        return out, stats

    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        out = {"table": self._quantize(state["table"], bits)}
        if self.mesh is None and self.n_shards == 1 and not self.plus:
            # freeze-time packed sketch view: the serving query re-packs
            # the [S, 3C] cell view per eval otherwise (~440 us at
            # CriteoTB sizes; hotsketch.query_cells_packed)
            from ..sketch.hotsketch import _pack_cells
            sk = state["sketch"]
            out["sk_packed"] = _pack_cells(sk.val, sk.cnt, sk.dic)
        return out

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        """Same sketch routing as gather; row fetch dequantizes on-chip.
        The sketch (int/bookkeeping state) stays full precision."""
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        oids = self._oids(ids)
        if self.mesh is not None or self.n_shards > 1:
            from ..sketch.sharded import query_sharded, query_sharded_plus
            qfn = query_sharded_plus if self.plus else query_sharded
            q = qfn(self.sketch_cfg, self.n_shards, state["sketch"],
                    oids.reshape(-1)).reshape(b, f)
        elif "sk_packed" in qt:
            from ..sketch.hotsketch import query_cells_packed
            q = query_cells_packed(self.sketch_cfg, qt["sk_packed"],
                                   oids.reshape(-1)).reshape(b, f)
        else:
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
