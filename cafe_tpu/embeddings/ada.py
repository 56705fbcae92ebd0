"""AdaEmbed baseline (OSDI'23), device-resident.

Reference implementation: ada_embedding_bag.py + the policy methods in
init_embed.py:234-287. One global weight pool [hotn+1, dim]; an int32 map
`dic` routes each feature id to its admitted slot (0 = not admitted, row 0 is
pinned to zeros). Per-step, per-id gradient norms accumulate into an
importance array; periodically a sampled churn check (init_embed.py:276-287)
triggers a full rebuild (argsort + admit/evict slot swap, :253-274); the
importance decays by 0.8 every 16384 steps (:250-251).

The reference keeps `dic`/`grad_norm` in host numpy and rebuilds with
np.argsort; here everything is device state inside the train step, the
rebuild is a lax.cond-gated top-k/argsort on the chip, and the sampled check
uses with-replacement sampling (statistically equivalent at N >> sample).
Row 0 is kept zero by *dropping* updates to it rather than re-zeroing every
forward (ada_embedding_bag.py:28-29) — same observable behavior.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .base import Part, _offsets, round_up

CHECK_EVERY = 4096
DECAY_EVERY = 16384
DECAY = 0.8
SAMPLE = 1_000_000
CHURN_FRAC = 0.05


class AdaPart(Part):
    def __init__(self, field_idx: List[int], counts: List[int], hotn: int,
                 dim: int, optimizer: str = "sgd"):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.hotn = int(hotn)
        if self.hotn <= 0:
            # the sizing formula (sizing.ada_hotn, init_embed.py:83)
            # charges the int32 dic + f32 importance (2 i32-equivalents
            # per id) against the budget, so cr must exceed 2/dim
            raise ValueError(
                f"ada: hotn={self.hotn} — the row budget is consumed by "
                f"the dic/importance overhead; ada needs compress_rate > "
                f"2/dim (= {2.0 / dim:.4f} at dim {dim})")
        self.dim = dim
        self.optimizer = optimizer
        self.np_offsets = _offsets(self.counts)
        self.total_n = int(sum(self.counts))
        self.hot_rate = self.hotn / max(self.total_n, 1)
        self.sample = min(SAMPLE, self.total_n)
        self.n_shards = 1

    def enable_mesh(self, mesh) -> bool:
        """Explicit SPMD exchange with SHARD-LOCAL admission policy (the
        AdaEmbed analogue of the shard-local sketch, SURVEY.md §7): the
        weight pool splits into per-shard slot ranges, ids distribute
        CYCLICALLY (id % n) so every shard sees a uniform sample of each
        field, and each shard runs its own sampled churn check + rebuild
        over its ids with budget hotn/n — no global argsort, no
        table-sized collectives ever. dic/grad_norm are stored
        cyclic-permuted so a block shard IS a cyclic id slice."""
        from .base import _MIN_SHARD_ROWS
        n = int(mesh.devices.size)
        wpad = round_up(self.hotn + 1)
        np_pad = round_up(self.total_n)
        if wpad % n or np_pad % n:
            return False
        if wpad < max(n, _MIN_SHARD_ROWS) or self.hotn // n < 1:
            return False
        self.mesh = mesh
        self.n_shards = n
        return True

    def _store_perm(self, np_pad: int) -> np.ndarray:
        """store[k] holds global id g = (k % L)*n + k // L  (shard-major
        cyclic permutation; L = np_pad // n)."""
        n = self.n_shards
        L = np_pad // n
        k = np.arange(np_pad, dtype=np.int64)
        return (k % L) * n + k // L

    def init(self, rng: np.random.Generator) -> Dict:
        # reference leaves the pool uninitialized torch.Tensor and zeroes
        # admitted rows at admit time; we start at zero for determinism.
        np_pad = round_up(self.total_n)
        # padding lanes of grad_norm start below any real importance so the
        # rebuild's top-k never selects a padded id
        gn = np.full(np_pad, -1.0, dtype=np.float32)
        gn[: self.total_n] = 0.0
        if self.n_shards > 1:
            gn = gn[self._store_perm(np_pad)]
        state = {
            "weight": jnp.zeros((round_up(self.hotn + 1), self.dim),
                                jnp.float32),
            "dic": jnp.zeros((np_pad,), jnp.int32),
            "grad_norm": jnp.asarray(gn),
            "step": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1))),
        }
        return self._maybe_acc(state, "weight")

    def gather(self, state: Dict, ids: jnp.ndarray):
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        gid = ids + off[None, :]
        if self.mesh is not None:
            return self._gather_sharded(state, gid)
        rows = state["dic"][gid]
        return state["weight"][rows], (gid, rows)

    def _gather_sharded(self, state: Dict, gid: jnp.ndarray):
        """all_gather the global ids, cyclic owners answer dic (one owner
        per lane => int32 psum is exact), owner-compute gather on the
        slot-range-sharded pool + psum_scatter. O(batch) traffic."""
        from jax.sharding import PartitionSpec as P
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (_owner_rows, mesh_axes,
                                         owner_lookup_cyclic)

        AXIS = mesh_axes(self.mesh)
        n = self.n_shards

        def f(w_l, dic_l, gid_l):
            b_l, f_l = gid_l.shape
            m = b_l * f_l
            me = jax.lax.axis_index(AXIS)
            all_gid = jax.lax.all_gather(gid_l.reshape(m), AXIS,
                                         tiled=True)
            rows = owner_lookup_cyclic(dic_l, all_gid, n, AXIS)
            out = jax.lax.psum_scatter(_owner_rows(w_l, rows, AXIS), AXIS,
                                       scatter_dimension=0, tiled=True)
            rows_me = jax.lax.dynamic_slice(rows, (me * m,), (m,))
            return out.reshape(b_l, f_l, -1), rows_me.reshape(b_l, f_l)

        raw, rows = shard_map(
            f, self.mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None)),
            out_specs=(P(AXIS, None, None), P(AXIS, None)),
        )(state["weight"], state["dic"], gid)
        return raw, (gid, rows)

    def apply_grads(self, state: Dict, ids: jnp.ndarray, g_raw: jnp.ndarray,
                    aux, lr: float):
        gid, rows = aux
        if self.mesh is not None:
            return self._apply_sharded(state, gid, rows, g_raw, lr)
        b, f, d = g_raw.shape
        g = g_raw.reshape(b * f, d)

        # weight update; slot 0 (not-admitted) updates are dropped
        widx = jnp.where(rows > 0, rows,
                         state["weight"].shape[0]).reshape(-1)
        state = self._table_update(state, "weight", widx, g, lr)

        # importance accumulation, normalized per field (init_embed.py:239-242)
        norms = jnp.sqrt(jnp.sum(g_raw * g_raw, axis=-1) + 1e-30)
        norms = norms * b / (jnp.sum(norms, axis=0, keepdims=True) + 1e-30)
        grad_norm = state["grad_norm"].at[gid.reshape(-1)].add(
            norms.reshape(-1))

        step = state["step"] + 1
        grad_norm = jax.lax.cond(
            step % DECAY_EVERY == 0, lambda a: a * DECAY, lambda a: a,
            grad_norm)

        key, sub = jax.random.split(state["key"])
        st = {**state, "grad_norm": grad_norm, "step": step, "key": key}
        st = jax.lax.cond(
            (step == 1) | (step % CHECK_EVERY == 0),
            lambda s: self._check(s, sub), lambda s: s, st)
        return st, {"ada_admitted": (st["dic"] > 0).sum()}

    def _apply_sharded(self, state: Dict, gid: jnp.ndarray,
                       rows: jnp.ndarray, g_raw: jnp.ndarray, lr: float):
        """Owner-compute pool update + cyclic-owner importance
        accumulation + SHARD-LOCAL sampled check/rebuild. The check and
        rebuild contain no collectives, so shards may rebuild at
        different steps (per-shard policy — the AdaEmbed analogue of the
        shard-local sketch thresholds the round-1 verdict accepted)."""
        import jax as _jax
        from jax.sharding import PartitionSpec as P
        from ..ops.sparse import apply_rows as _apply_rows, coalesce
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (DROP_ROW, _local_idx, mesh_axes,
                                         slot_specs)

        AXIS = mesh_axes(self.mesh)
        n = self.n_shards
        b, f, d = g_raw.shape
        norms = jnp.sqrt(jnp.sum(g_raw * g_raw, axis=-1) + 1e-30)
        norms = norms * b / (jnp.sum(norms, axis=0, keepdims=True) + 1e-30)
        slots_in = self._slots_of(state, "weight")
        sl_specs = slot_specs(slots_in, AXIS)

        def f(w_l, sl, dic_l, gn_l, step, key, gid_l, rows_l, g_l, sc_l):
            b_l, f_l = gid_l.shape
            m = b_l * f_l
            me = _jax.lax.axis_index(AXIS)
            L = dic_l.shape[0]
            W_l = w_l.shape[0]

            # --- pool update: dedup, all_gather, owner applies; slot 0
            # (not admitted) lanes drop
            widx = jnp.where(rows_l > 0, rows_l, DROP_ROW).reshape(m)
            g2 = g_l.reshape(m, -1)
            widx, g2 = coalesce(widx, g2, drop_sentinel=int(DROP_ROW))
            all_w = _jax.lax.all_gather(widx, AXIS, tiled=True)
            all_g = _jax.lax.all_gather(g2, AXIS, tiled=True)
            loc = _local_idx(W_l, all_w, AXIS)
            w_l, sl = _apply_rows(w_l, sl, loc, all_g, lr, self.optimizer)

            # --- importance accumulation at the cyclic owners
            all_gid = _jax.lax.all_gather(gid_l.reshape(m), AXIS,
                                          tiled=True)
            all_sc = _jax.lax.all_gather(sc_l.reshape(m), AXIS, tiled=True)
            mine = all_gid % n == me
            gloc = jnp.where(mine, all_gid // n, L)
            gn_l = gn_l.at[gloc].add(all_sc, mode="drop")

            step = step + 1
            gn_l = _jax.lax.cond(step % DECAY_EVERY == 0,
                                 lambda a: a * DECAY, lambda a: a, gn_l)

            key, sub = _jax.random.split(key)
            sub = _jax.random.fold_in(sub, me)
            carry = (w_l, sl, dic_l, gn_l)
            carry = _jax.lax.cond(
                (step == 1) | (step % CHECK_EVERY == 0),
                lambda c: self._check_local(c, sub, me),
                lambda c: c, carry)
            w_l, sl, dic_l, gn_l = carry
            n_adm = _jax.lax.psum((dic_l != 0).sum(dtype=jnp.int32), AXIS)
            return w_l, sl, dic_l, gn_l, step, key, n_adm

        w, sl, dic, gn, step, key, n_adm = shard_map(
            f, self.mesh,
            in_specs=(P(AXIS, None), sl_specs, P(AXIS), P(AXIS), P(), P(),
                      P(AXIS, None), P(AXIS, None), P(AXIS, None, None),
                      P(AXIS, None)),
            out_specs=(P(AXIS, None), sl_specs, P(AXIS), P(AXIS), P(),
                       P(), P()),
        )(state["weight"], slots_in, state["dic"], state["grad_norm"],
          state["step"], state["key"], gid, rows, g_raw, norms)
        out = self._put_slots(
            {**state, "weight": w, "dic": dic, "grad_norm": gn,
             "step": step, "key": key}, "weight", sl)
        return out, {"ada_admitted": n_adm}

    def _check_local(self, carry, key, me):
        """Per-shard sampled churn estimate over the shard's cyclic id
        slice (sample/n draws; same statistic as _check)."""
        w_l, sl, dic_l, gn_l = carry
        n = self.n_shards
        L = gn_l.shape[0]
        n_live = jnp.maximum((self.total_n - 1 - me) // n + 1, 1)
        sample_l = max(self.sample // n, 1)
        idx = jax.random.randint(key, (sample_l,), 0,
                                 jnp.minimum(n_live, L))
        cnt = gn_l[idx]
        dic = dic_l[idx]
        m_l = max(int(np.ceil(sample_l * self.hot_rate)), 1)
        kth = jax.lax.top_k(cnt, m_l)[0][-1]
        would_be_hot = cnt >= kth
        churn = jnp.sum(would_be_hot & (dic == 0))
        return jax.lax.cond(churn > CHURN_FRAC * m_l,
                            lambda c: self._rebuild_local(c, me),
                            lambda c: c, carry)

    def _rebuild_local(self, carry, me):
        """Shard-local admit/evict swap over the shard's cyclic id slice
        and its OWN slot range [me*W_l, (me+1)*W_l): local top-(hotn/n)
        on per-field percentile-normalized importance. The cyclic
        distribution makes each shard a uniform 1/n sample of every
        field, so local percentiles/top-k approximate the reference's
        global rebuild (init_embed.py:253-274) with zero collectives."""
        w_l, sl, dic_l, gn_l = carry
        n = self.n_shards
        L = gn_l.shape[0]
        W_l = w_l.shape[0]
        me32 = me.astype(jnp.int32)
        g_glob = jnp.arange(L, dtype=jnp.int32) * n + me32
        electable = g_glob < self.total_n

        cnt = gn_l
        normed = jnp.zeros_like(cnt)
        for i, n_i in enumerate(self.counts):
            lo = int(self.np_offsets[i])
            mask = (g_glob >= lo) & (g_glob < lo + n_i)
            vals = jnp.where(mask, cnt, jnp.nan)
            p = jnp.nanpercentile(vals, 95.0)
            seg = jnp.where(p != 0, cnt / jnp.where(p != 0, p, 1.0), cnt)
            normed = jnp.where(mask, seg, normed)
        cnt = jnp.where(electable, normed, -jnp.inf)

        hotn_l = max(self.hotn // n, 1)
        top = jax.lax.top_k(cnt, hotn_l)[1]
        new_hot = jnp.zeros((L,), bool).at[top].set(True) & electable
        old_hot = dic_l != 0
        admit = new_hot & ~old_hot
        evict = old_hot & ~new_hot
        keep = new_hot & old_hot

        lo_slot = me32 * W_l
        used = jnp.zeros((W_l + 1,), bool).at[
            jnp.where(keep, dic_l - lo_slot, W_l)].set(
                True, mode="drop")[:W_l]
        slot_loc = jnp.arange(W_l, dtype=jnp.int32)
        # global slot 0 (shard 0, local 0) is the not-admitted sentinel
        free_mask = ~used & ~((slot_loc == 0) & (me32 == 0))
        free_loc = slot_loc[jnp.argsort(~free_mask, stable=True)]
        n_free = free_mask.sum()
        admit_pos = jnp.argsort(~admit, stable=True)
        n_admit = admit.sum()
        lane = jnp.arange(L, dtype=jnp.int32)
        slots_glob = free_loc[jnp.clip(lane, 0, W_l - 1)] + lo_slot
        write = lane < jnp.minimum(n_admit, n_free)
        dic = dic_l.at[jnp.where(write, admit_pos, L)].set(
            slots_glob, mode="drop")
        dic = jnp.where(evict, 0, dic)
        # mask-multiply instead of an L-lane zero-row scatter (same
        # [L, dim] broadcast blowup as the single-chip rebuild): kept
        # slots survive, the whole free set zeroes — identical to
        # zeroing just the admitted subset since free slots are
        # unreferenced until admitted.
        w_l = jnp.where(used[:, None], w_l, 0.0)
        sl = {k: (jnp.where(used[:, None], v, 0.0)
                  if getattr(v, "ndim", 0) == 2 else v)
              for k, v in sl.items()}
        return w_l, sl, dic, gn_l

    def _dic_lookup(self, state: Dict, gid: jnp.ndarray) -> jnp.ndarray:
        """dic[gid] through the storage layout (cyclic-permuted when the
        sharded layout is active)."""
        if self.n_shards > 1:
            L = state["dic"].shape[0] // self.n_shards
            return state["dic"][(gid % self.n_shards) * L
                                + gid // self.n_shards]
        return state["dic"][gid]

    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        # row 0 (not-admitted) is all-zero and dequantizes to exactly zero
        return {"weight": self._quantize(state["weight"], bits)}

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        gid = ids + off[None, :]
        if self.mesh is not None:
            # the O(vocab) dic is cyclic-sharded under the explicit
            # exchange — answer it owner-compute (like the float path)
            # instead of letting the auto-partitioner materialize it.
            return self._gather_quantized_sharded(state, qt, gid)
        rows = self._dic_lookup(state, gid)
        return dequantize_rows(qt["weight"], rows.reshape(-1)).reshape(
            b, f, -1)

    def _gather_quantized_sharded(self, state: Dict, qt: Dict,
                                  gid: jnp.ndarray):
        """_gather_sharded for the int4/int8 serving copy: cyclic owners
        answer dic lanes, slot-range owners dequantize their rows, f32
        rows psum_scatter back — O(batch) traffic, never O(vocab)."""
        from jax.sharding import PartitionSpec as P
        from ..ops.quantized import QuantizedTable, dequantize_rows
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (mesh_axes, owner_lookup_cyclic,
                                         owner_rows_with)

        AXIS = mesh_axes(self.mesh)
        n = self.n_shards
        qtab = qt["weight"]
        bits = qtab.bits

        def f(codes, scale, zero, dic_l, gid_l):
            b_l, f_l = gid_l.shape
            m = b_l * f_l
            all_gid = jax.lax.all_gather(gid_l.reshape(m), AXIS,
                                         tiled=True)
            rows = owner_lookup_cyclic(dic_l, all_gid, n, AXIS)
            local = QuantizedTable(codes, scale, zero, bits)
            vals = owner_rows_with(lambda i: dequantize_rows(local, i),
                                   codes.shape[0], rows, AXIS)
            out = jax.lax.psum_scatter(vals, AXIS, scatter_dimension=0,
                                       tiled=True)
            return out.reshape(b_l, f_l, -1)

        return shard_map(
            f, self.mesh,
            in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                      P(AXIS), P(AXIS, None)),
            out_specs=P(AXIS, None, None),
        )(qtab.codes, qtab.scale, qtab.zero, state["dic"], gid)

    # -- policy -------------------------------------------------------
    def _check(self, state: Dict, key) -> Dict:
        """Sampled churn estimate (init_embed.py:276-287)."""
        idx = jax.random.randint(key, (self.sample,), 0, self.total_n)
        cnt = state["grad_norm"][idx]
        dic = state["dic"][idx]
        m = max(int(np.ceil(self.sample * self.hot_rate)), 1)
        kth = jax.lax.top_k(cnt, m)[0][-1]
        would_be_hot = cnt >= kth
        churn = jnp.sum(would_be_hot & (dic == 0))
        return jax.lax.cond(churn > CHURN_FRAC * m, self._rebuild,
                            lambda s: s, state)

    def _rebuild(self, state: Dict) -> Dict:
        """Full admit/evict swap (init_embed.py:253-274): rank all ids by
        per-field-percentile-normalized importance, admit the global top
        hotn, evicted ids hand their slots (zeroed) to admitted ones."""
        cnt = state["grad_norm"]
        np_pad = cnt.shape[0]
        # per-field 95th-percentile normalization; field slices are static
        parts = []
        for i, n in enumerate(self.counts):
            lo = int(self.np_offsets[i])
            seg = jax.lax.slice(cnt, (lo,), (lo + n,))
            p = jnp.percentile(seg, 95.0)
            parts.append(jnp.where(p != 0, seg / p, seg))
        if np_pad > self.total_n:  # keep padding lanes unelectable
            parts.append(jnp.full((np_pad - self.total_n,), -1.0))
        cnt = jnp.concatenate(parts)

        top = jax.lax.top_k(cnt, self.hotn)[1]
        new_hot = jnp.zeros((np_pad,), bool).at[top].set(True)
        old_hot = state["dic"] != 0
        admit = new_hot & ~old_hot
        evict = old_hot & ~new_hot

        def packed(mask, values):
            order = jnp.argsort(~mask, stable=True)  # True lanes first
            return values[order], order

        _, admit_pos = packed(admit, state["dic"])
        n_admit = admit.sum()
        # slot source: the ACTUAL free-slot set after eviction — slots
        # {1..hotn} minus those still held by kept ids. (The previous
        # evicted-slots-then-lane+1 fallback could hand an already-assigned
        # slot to a second feature when n_admit > n_evict on a non-initial
        # rebuild.) |free| = hotn - |keep| >= |admit| always, since the
        # top-k has at most hotn lanes.
        keep = new_hot & old_hot
        wpad = state["weight"].shape[0]  # >= hotn + 1
        used = jnp.zeros((wpad,), bool).at[
            jnp.where(keep, state["dic"], 0)].set(True, mode="drop")
        slot_idx = jnp.arange(wpad, dtype=jnp.int32)
        free_mask = (slot_idx >= 1) & (slot_idx <= self.hotn) & ~used
        free_slots = slot_idx[jnp.argsort(~free_mask, stable=True)]
        n_free = free_mask.sum()
        lane = jnp.arange(np_pad)
        slots = free_slots[jnp.clip(lane, 0, wpad - 1)]
        write = lane < jnp.minimum(n_admit, n_free)
        dic = state["dic"].at[jnp.where(write, admit_pos, np_pad)].set(
            slots, mode="drop")
        dic = jnp.where(evict, 0, dic)
        # zero every non-kept slot with a fused mask-multiply, NOT a
        # scatter of zero-rows indexed by the np_pad-long lane vector:
        # XLA materializes that scatter's updates operand as a
        # [np_pad, dim] broadcast (17 GB at CriteoTB vocab x dim 128 —
        # observed HBM OOM). Free slots are unreferenced until admitted,
        # so zeroing the whole free set == zeroing the admitted subset;
        # `used` keeps exactly the kept slots (+ the slot-0 sentinel,
        # which is always zero anyway).
        weight = jnp.where(used[:, None], state["weight"], 0.0)
        out = {**state, "dic": dic, "weight": weight}
        # recycled slots restart their optimizer state too (adagrad acc /
        # adam moments); adam's step scalar is table-global and stays
        from ..ops.sparse import SLOT_SUFFIXES
        for sfx in SLOT_SUFFIXES[self.optimizer].values():
            if state["weight" + sfx].ndim == 2:
                out["weight" + sfx] = jnp.where(
                    used[:, None], state["weight" + sfx], 0.0)
        return out
