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
        self.dim = dim
        self.optimizer = optimizer
        self.np_offsets = _offsets(self.counts)
        self.total_n = int(sum(self.counts))
        self.hot_rate = self.hotn / max(self.total_n, 1)
        self.sample = min(SAMPLE, self.total_n)

    def init(self, rng: np.random.Generator) -> Dict:
        # reference leaves the pool uninitialized torch.Tensor and zeroes
        # admitted rows at admit time; we start at zero for determinism.
        np_pad = round_up(self.total_n)
        # padding lanes of grad_norm start below any real importance so the
        # rebuild's top-k never selects a padded id
        gn = np.full(np_pad, -1.0, dtype=np.float32)
        gn[: self.total_n] = 0.0
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
        rows = state["dic"][gid]
        return state["weight"][rows], (gid, rows)

    def apply_grads(self, state: Dict, ids: jnp.ndarray, g_raw: jnp.ndarray,
                    aux, lr: float):
        gid, rows = aux
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

    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        # row 0 (not-admitted) is all-zero and dequantizes to exactly zero
        return {"weight": self._quantize(state["weight"], bits)}

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        rows = state["dic"][ids + off[None, :]]
        return dequantize_rows(qt["weight"], rows.reshape(-1)).reshape(
            b, f, -1)

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
        wslots = jnp.where(write, slots, state["weight"].shape[0])
        weight = state["weight"].at[wslots].set(0.0, mode="drop")
        out = {**state, "dic": dic, "weight": weight}
        # recycled slots restart their optimizer state too (adagrad acc /
        # adam moments); adam's step scalar is table-global and stays
        from ..ops.sparse import SLOT_SUFFIXES
        for sfx in SLOT_SUFFIXES[self.optimizer].values():
            if state["weight" + sfx].ndim == 2:
                out["weight" + sfx] = state["weight" + sfx].at[wslots].set(
                    0.0, mode="drop")
        return out
