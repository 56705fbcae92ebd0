"""Composite embedding layer: field-partitioned parts with fused lookups.

The reference builds one nn.Module per sparse field and loops over fields in
Python (init_embed.py:206-223) — 26 separate kernel launches per step. Here
fields with the same treatment are grouped into a *part* backed by one
concatenated table, so each part is a single gather / single scatter no
matter how many fields it serves; XLA lays the [rows, dim] tables out in HBM
and the gathers saturate memory bandwidth.

Contract per part:
  init(rng)                        -> state pytree (tables + optimizer slots)
  init_dense(rng)                  -> differentiable params (e.g. MDE projections)
  gather(state, ids[B,Fp])         -> (raw, aux); raw is what the loss is
                                      differentiated against, aux is bookkeeping
  transform(dense_params, raw)     -> feats [B, Fp, D] (differentiable)
  apply_grads(state, ids, g_raw, aux, lr) -> (state, stats)

The trainer treats (raw, dense_params) as differentiable leaves and applies
table updates itself via each part's apply_grads — this is how sparse
embedding gradients stay sparse end-to-end (no [vocab, dim] dense grads).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import SLOT_SUFFIXES, apply_rows, init_slots

# All device tables are padded to a multiple of this row count so they can be
# row-sharded over any power-of-two mesh up to 512 devices (uneven sharding
# is not expressible with NamedSharding). Padding rows are never indexed.
ROW_ALIGN = 512

# tables smaller than this stay replicated even under the explicit
# exchange — the collective round-trip costs more than it saves
_MIN_SHARD_ROWS = 1024


def round_up(n: int, align: int = ROW_ALIGN) -> int:
    return ((max(n, 1) + align - 1) // align) * align


def _uniform_init(rng: np.random.Generator, rows_per_field: Sequence[int],
                  scales: Sequence[float], dim: int) -> np.ndarray:
    """Concatenated (row-padded) table with per-field uniform slices."""
    total = int(sum(rows_per_field))
    out = np.zeros((round_up(total), dim), dtype=np.float32)
    lo = 0
    for rows, scale in zip(rows_per_field, scales):
        out[lo:lo + rows] = rng.uniform(-scale, scale,
                                        size=(rows, dim)).astype(np.float32)
        lo += rows
    return out


def _offsets(rows_per_field: Sequence[int]) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(rows_per_field)[:-1]]).astype(
        np.int64)


class Part:
    field_idx: List[int]
    # set by EmbeddingLayer.set_mesh: when not None, gather/apply_grads use
    # the explicit shard_map exchange (parallel/exchange.py) instead of
    # plain indexing — row-sharded tables, O(batch) collectives
    mesh = None
    # unique-compact exchange knob (exchange.unique_cap): fraction of the
    # flattened batch to budget for distinct ids; 0 = full-size buffers
    unique_frac = 0.0
    # exchange mode for the heavy row legs (--shard_exchange):
    #   'explicit'         AG + owner-compute + psum_scatter (default)
    #   'a2a'              request-routed lax.all_to_all (~n-fold fewer
    #                      wire bytes on the row legs, exchange.py)
    #   'pallas'           a2a with the remote-DMA kernel (pallas_a2a.py)
    #   'pallas_interpret' same, CPU-emulated (tests)
    exchange_mode = "explicit"

    def _sharded_fetch(self, table, flat):
        """The configured row-fetch exchange (see exchange_mode)."""
        from ..parallel.exchange import sharded_fetch, sharded_fetch_a2a
        if self.exchange_mode != "explicit":
            return sharded_fetch_a2a(
                self.mesh, table, flat,
                impl="lax" if self.exchange_mode == "a2a"
                else self.exchange_mode)
        return sharded_fetch(self.mesh, table, flat, self.unique_frac)

    def _sharded_apply(self, table, slots, idx2d, g3d, lr):
        """The configured row-update exchange (see exchange_mode)."""
        from ..parallel.exchange import sharded_apply, sharded_apply_a2a
        if self.exchange_mode != "explicit":
            return sharded_apply_a2a(
                self.mesh, table, slots, idx2d, g3d, lr, self.optimizer,
                impl="lax" if self.exchange_mode == "a2a"
                else self.exchange_mode)
        return sharded_apply(self.mesh, table, slots, idx2d, g3d, lr,
                             self.optimizer, self.unique_frac)

    def init(self, rng: np.random.Generator) -> Dict:
        raise NotImplementedError

    def init_dense(self, rng: np.random.Generator) -> Dict:
        return {}

    def gather(self, state, ids):
        raise NotImplementedError

    def transform(self, dense_params, raw):
        return raw  # identity for uniform-dim methods

    def apply_grads(self, state, ids, g_raw, aux, lr: float):
        raise NotImplementedError

    def enable_mesh(self, mesh) -> bool:
        """Opt this part into the explicit shard_map exchange. Default:
        stay replicated/auto-partitioned (small tables are cheaper to
        replicate than to exchange). Must be called before init()."""
        return False

    # --- quantized serving (legacy --quantize-emb-with-bit capability,
    # dlrm_s_pytorch.py:628-659, 759-777 — table-type-agnostic there) ----
    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        """Quantize this part's float row tables once for inference.
        Returns a dict of QuantizedTables keyed like the state entries."""
        raise NotImplementedError

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        """Forward lookup against quantized tables; routing/bookkeeping
        state (sketches, dicts) stays full precision. Returns `raw` in the
        same shape `gather` produces (transform applies afterwards)."""
        raise NotImplementedError

    def _quantize(self, table: jnp.ndarray, bits: int):
        from ..ops.quantized import quantize_rowwise
        if bits == 4 and table.shape[1] % 2:
            bits = 8  # int4 packs code pairs; odd-dim tables serve at 8-bit
        return quantize_rowwise(table, bits)

    # --- shared sparse-update helpers ---------------------------------
    def _slots_of(self, state: Dict, key: str) -> Dict:
        """Optimizer-slot dict for `key` pulled out of the state dict
        (state keys follow SLOT_SUFFIXES: table_acc / table_m / ...)."""
        return {name: state[key + sfx]
                for name, sfx in SLOT_SUFFIXES[self.optimizer].items()}

    def _put_slots(self, state: Dict, key: str, slots: Dict) -> Dict:
        for name, sfx in SLOT_SUFFIXES[self.optimizer].items():
            state[key + sfx] = slots[name]
        return state

    def _table_update(self, state: Dict, key: str, idx: jnp.ndarray,
                      grad: jnp.ndarray, lr: float) -> Dict:
        table, slots = apply_rows(state[key], self._slots_of(state, key),
                                  idx, grad, lr, self.optimizer)
        return self._put_slots({**state, key: table}, key, slots)

    def _maybe_acc(self, state: Dict, key: str) -> Dict:
        return self._put_slots(state, key,
                               init_slots(state[key], self.optimizer))


class HashedTablePart(Part):
    """Full and hash-compressed fields: row = offset_f + (id % real_n_f).

    With real_n == n this is the uncompressed table (the mod is identity);
    otherwise it is the reference HashEmbeddingBag (hash_embedding_bag.py:17).

    `weighted` implements the legacy v_W_l weighted pooling
    (dlrm_s_pytorch.py:343-354, 622-625): a per-RAW-ID scalar weight
    (v_W_l spans the full vocabulary and is gathered by the raw index
    BEFORE any hashing), init 1, multiplies the looked-up vector;
    "learned" trains it with the same sparse optimizer, "fixed" keeps it
    constant.
    """

    def __init__(self, field_idx, counts, real_ns, dim, optimizer="sgd",
                 weighted: str = ""):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.real_ns = [int(r) for r in real_ns]
        self.dim = dim
        self.optimizer = optimizer
        assert weighted in ("", "fixed", "learned"), weighted
        self.weighted = weighted
        self.np_offsets = _offsets(self.real_ns)
        self.rows = int(sum(self.real_ns))
        # raw-id keyed weight table (full vocab, like the reference's
        # torch.ones(n) per field)
        self.w_offsets = _offsets(self.counts)
        self.w_rows = int(sum(self.counts))

    def enable_mesh(self, mesh) -> bool:
        n = int(mesh.devices.size)
        rows_pad = round_up(self.rows)
        if rows_pad % n or rows_pad < max(n, _MIN_SHARD_ROWS):
            return False
        self.mesh = mesh
        return True

    def init(self, rng):
        scales = [np.sqrt(1.0 / max(n, 5)) for n in self.counts]
        state = {"table": jnp.asarray(
            _uniform_init(rng, self.real_ns, scales, self.dim))}
        if self.weighted:
            state["w"] = jnp.ones((round_up(self.w_rows), 1), jnp.float32)
            if self.weighted == "learned":
                state = self._maybe_acc(state, "w")
        return self._maybe_acc(state, "table")

    def _w_index(self, ids):
        woff = jnp.asarray(self.w_offsets, dtype=jnp.int32)
        return ids + woff[None, :]

    def gather(self, state, ids):
        real = jnp.asarray(self.real_ns, dtype=jnp.int32)
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = (ids % real[None, :]) + off[None, :]
        if self.mesh is not None:
            rows = self._sharded_fetch(state["table"], flat)
        else:
            rows = state["table"][flat]
        if self.weighted:
            # w is [vocab, 1] and stays replicated in sharded mode (its
            # lookup/update are cheap; XLA handles replicated access).
            # "learned" needs the pre-weight rows again in apply_grads;
            # carry them in aux so the sharded path pays ONE exchange.
            pre = rows
            rows = rows * state["w"][self._w_index(ids)]
            if self.weighted == "learned":
                return rows, (flat, pre)
        return rows, flat

    def apply_grads(self, state, ids, g_raw, aux, lr):
        b, f, d = g_raw.shape
        if self.weighted:
            # raw = table[hash(i)] * w[i]: chain rule through both factors
            if self.weighted == "learned":
                flat2d, pre = aux
                rows = pre.reshape(b * f, d)
            else:
                flat2d = aux
            widx = self._w_index(ids).reshape(b * f)
            g = g_raw.reshape(b * f, d)
            g_table = g * state["w"][widx]
            if self.weighted == "learned":
                g_w = jnp.sum(g * rows, axis=-1, keepdims=True)
                state = self._table_update(state, "w", widx, g_w, lr)
            state = self._table_update_maybe_sharded(
                state, "table", flat2d, g_table.reshape(b, f, d), lr)
            return state, {}
        state = self._table_update_maybe_sharded(state, "table", aux,
                                                 g_raw, lr)
        return state, {}

    def _table_update_maybe_sharded(self, state, key, idx2d, g3d, lr):
        """Route the table update through the explicit exchange when a
        mesh is set; fall back to the direct scatter otherwise."""
        if self.mesh is None:
            b, f, d = g3d.shape
            return self._table_update(state, key, idx2d.reshape(b * f),
                                      g3d.reshape(b * f, d), lr)
        table, slots = self._sharded_apply(
            state[key], self._slots_of(state, key), idx2d, g3d, lr)
        return self._put_slots({**state, key: table}, key, slots)

    def quantize_for_serving(self, state, bits):
        return {"table": self._quantize(state["table"], bits)}

    def gather_quantized(self, state, qt, ids):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        real = jnp.asarray(self.real_ns, dtype=jnp.int32)
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = (ids % real[None, :]) + off[None, :]
        rows = dequantize_rows(qt["table"], flat.reshape(-1)).reshape(
            b, f, -1)
        if self.weighted:
            rows = rows * state["w"][self._w_index(ids)]
        return rows


class QRPart(Part):
    """Quotient-remainder fields (qr_embedding_bag.py:60-77): the feature
    vector combines q_table[id // coll] and r_table[id % coll].

    `operation` mirrors the legacy composition ops
    (tricks/qr_embedding_bag.py:57,136): "add" (the only one the reference
    actually runs — :148 overrides the arg), "mult" (elementwise product),
    and "concat" (here the two tables hold D/2 halves so the output dim
    stays D; the legacy signature concatenated two full-D tables to 2D,
    which would change the tower shapes)."""

    def __init__(self, field_idx, counts, collisions, dim, optimizer="sgd",
                 operation: str = "add"):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.collisions = int(collisions)
        self.dim = dim
        self.optimizer = optimizer
        assert operation in ("add", "mult", "concat"), operation
        self.operation = operation
        self.q_dim = (dim + 1) // 2 if operation == "concat" else dim
        self.r_dim = dim - self.q_dim if operation == "concat" else dim
        self.q_rows = [int(np.ceil(n / collisions)) + 1 for n in self.counts]
        self.r_rows = [self.collisions] * len(self.counts)
        self.q_off = _offsets(self.q_rows)
        self.r_off = _offsets(self.r_rows)

    def enable_mesh(self, mesh) -> bool:
        """Explicit exchange for the QUOTIENT table — the O(vocab/coll)
        side that is multi-GB at CriteoTB scale (reference sizing
        init_embed.py:64-69). The remainder table is O(collisions) rows
        per field; it stays replicated because its entire gradient
        all-reduce is smaller than one batch of exchanged rows."""
        n = int(mesh.devices.size)
        q_pad = round_up(int(sum(self.q_rows)))
        if q_pad % n or q_pad < max(n, _MIN_SHARD_ROWS):
            return False
        self.mesh = mesh
        return True

    def init(self, rng):
        scales = [np.sqrt(1.0 / n) for n in self.counts]
        state = {
            "q": jnp.asarray(_uniform_init(rng, self.q_rows, scales,
                                           self.q_dim)),
            "r": jnp.asarray(_uniform_init(rng, self.r_rows, scales,
                                           self.r_dim)),
        }
        state = self._maybe_acc(state, "q")
        return self._maybe_acc(state, "r")

    def _rows(self, ids):
        qo = jnp.asarray(self.q_off, dtype=jnp.int32)
        ro = jnp.asarray(self.r_off, dtype=jnp.int32)
        qi = (ids // self.collisions) + qo[None, :]
        ri = (ids % self.collisions) + ro[None, :]
        return qi, ri

    def gather(self, state, ids):
        qi, ri = self._rows(ids)
        if self.mesh is not None:
            qv = self._sharded_fetch(state["q"], qi)
        else:
            qv = state["q"][qi]
        rv = state["r"][ri]
        if self.operation == "add":
            raw = qv + rv
        elif self.operation == "mult":
            raw = qv * rv
        else:
            raw = jnp.concatenate([qv, rv], axis=-1)
        # mult's backward needs both factors; carry them so the sharded
        # path pays ONE q exchange (and the single-device path one gather)
        aux = (qi, ri, qv, rv) if self.operation == "mult" else (qi, ri)
        return raw, aux

    def apply_grads(self, state, ids, g_raw, aux, lr):
        b, f, d = g_raw.shape
        if self.operation == "add":
            qi, ri = aux
            gq, gr = g_raw, g_raw
        elif self.operation == "mult":
            qi, ri, qv, rv = aux
            gq, gr = g_raw * rv, g_raw * qv
        else:
            qi, ri = aux
            gq = g_raw[..., :self.q_dim]
            gr = g_raw[..., self.q_dim:]
        if self.mesh is not None:
            q_tbl, slots = self._sharded_apply(
                state["q"], self._slots_of(state, "q"), qi, gq, lr)
            state = self._put_slots({**state, "q": q_tbl}, "q", slots)
        else:
            state = self._table_update(state, "q", qi.reshape(-1),
                                       gq.reshape(b * f, -1), lr)
        state = self._table_update(state, "r", ri.reshape(-1),
                                   gr.reshape(b * f, -1), lr)
        return state, {}

    def quantize_for_serving(self, state, bits):
        return {"q": self._quantize(state["q"], bits),
                "r": self._quantize(state["r"], bits)}

    def gather_quantized(self, state, qt, ids):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        qi, ri = self._rows(ids)
        qv = dequantize_rows(qt["q"], qi.reshape(-1)).reshape(b, f, -1)
        rv = dequantize_rows(qt["r"], ri.reshape(-1)).reshape(b, f, -1)
        if self.operation == "add":
            return qv + rv
        if self.operation == "mult":
            return qv * rv
        return jnp.concatenate([qv, rv], axis=-1)


class MDEGroupPart(Part):
    """Mixed-dimension fields sharing one reduced dim `d` (md_embedding_bag.py:
    71-91): low-dim table gather + per-field learned projection back to D.

    The projections are *dense* differentiable params (init_dense); their
    gradients flow through the trainer's autodiff like tower weights.
    """

    def __init__(self, field_idx, counts, low_dim, base_dim, optimizer="sgd"):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.low_dim = int(low_dim)
        self.dim = base_dim
        self.optimizer = optimizer
        self.np_offsets = _offsets(self.counts)

    def init(self, rng):
        scales = [np.sqrt(6.0 / (n + self.low_dim)) for n in self.counts]
        state = {"table": jnp.asarray(
            _uniform_init(rng, self.counts, scales, self.low_dim))}
        return self._maybe_acc(state, "table")

    def init_dense(self, rng):
        if self.low_dim == self.dim:
            return {}
        f = len(self.field_idx)
        bound = np.sqrt(6.0 / (self.low_dim + self.dim))
        proj = rng.uniform(-bound, bound,
                           size=(f, self.low_dim, self.dim)).astype(np.float32)
        return {"proj": jnp.asarray(proj)}

    def gather(self, state, ids):
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = ids + off[None, :]
        return state["table"][flat], flat

    def transform(self, dense_params, raw):
        if self.low_dim == self.dim:
            return raw
        return jnp.einsum("bfd,fde->bfe", raw, dense_params["proj"],
                          preferred_element_type=jnp.float32)

    def apply_grads(self, state, ids, g_raw, aux, lr):
        b, f, d = g_raw.shape
        state = self._table_update(state, "table", aux.reshape(b * f),
                                   g_raw.reshape(b * f, d), lr)
        return state, {}

    def quantize_for_serving(self, state, bits):
        return {"table": self._quantize(state["table"], bits)}

    def gather_quantized(self, state, qt, ids):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = ids + off[None, :]
        # low-dim raw; the MDE projection (a dense f32 param) applies in
        # transform exactly as in the float path
        return dequantize_rows(qt["table"], flat.reshape(-1)).reshape(
            b, f, -1)


class OffPart(Part):
    """Offline hot/cold fields (off_embedding_bag.py:33-50): a precomputed
    frequency-ranked hot dictionary routes ids to dedicated hot rows or a
    shared hash of cold rows. A field whose global frequency ranking left
    it no cold budget (num_cold <= 0) serves its non-hot ids from the HOT
    table by modulo — the reference's weight_cold=None branch
    (off_embedding_bag.py:36-49) — rather than aliasing them all to one
    padding row.

    Layout: like CafePart, hot and cold live in ONE device array (hot
    rows first, cold rows at `cold_base`), so the forward is a single
    routed gather and the backward a single scatter — and the explicit
    SPMD exchange needs only one owner-compute table plus a row-sharded
    hot_dict answered by its owners."""

    def __init__(self, field_idx, counts, hot_dicts, num_colds, dim,
                 optimizer="sgd"):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.dim = dim
        self.optimizer = optimizer
        self.num_hots = [int((hd >= 0).sum()) for hd in hot_dicts]
        self.num_colds = [max(int(c), 0) for c in num_colds]
        self.hot_fallback = [c <= 0 for c in self.num_colds]
        self.hot_off = _offsets([max(h, 1) for h in self.num_hots])
        self.cold_off = _offsets([max(c, 1) for c in self.num_colds])
        self.dict_off = _offsets(self.counts)
        self._hot_dict_np = np.concatenate(hot_dicts).astype(np.int32)
        self.hot_rows = int(sum(max(h, 1) for h in self.num_hots))
        self.cold_rows = int(sum(max(c, 1) for c in self.num_colds))
        # unified layout: [0, hot_rows) hot, [cold_base, ...) cold
        self.cold_base = round_up(self.hot_rows)
        self.total_rows = self.cold_base + round_up(self.cold_rows)

    def enable_mesh(self, mesh) -> bool:
        """Explicit exchange: unified table row-sharded; the int32
        hot_dict row-sharded too and answered owner-compute inside the
        same shard_map (a replicated dict would be O(vocab) memory per
        device — 1/dim of the table, still unacceptable at CriteoTB)."""
        n = int(mesh.devices.size)
        if self.total_rows % n or self.total_rows < max(n, _MIN_SHARD_ROWS):
            return False
        if round_up(len(self._hot_dict_np)) % n:
            return False
        self.mesh = mesh
        return True

    def init(self, rng):
        scales = [np.sqrt(1.0 / max(n, 5)) for n in self.counts]
        hd = self._hot_dict_np
        hd_pad = np.full(round_up(len(hd)), -1, dtype=np.int32)
        hd_pad[: len(hd)] = hd
        table = np.zeros((self.total_rows, self.dim), dtype=np.float32)
        hot = _uniform_init(rng, [max(h, 1) for h in self.num_hots],
                            scales, self.dim)
        cold = _uniform_init(rng, [max(c, 1) for c in self.num_colds],
                             scales, self.dim)
        table[: hot.shape[0]] = hot
        table[self.cold_base: self.cold_base + cold.shape[0]] = cold
        state = {
            "table": jnp.asarray(table),
            "hot_dict": jnp.asarray(hd_pad),
        }
        return self._maybe_acc(state, "table")

    def _route(self, ids, hd):
        """(ids, dict values) -> (unified row, use_hot) [B, F]."""
        hoff = jnp.asarray(self.hot_off, dtype=jnp.int32)
        coff = jnp.asarray(self.cold_off, dtype=jnp.int32)
        ncold = jnp.asarray([max(c, 1) for c in self.num_colds],
                            dtype=jnp.int32)
        nhot = jnp.asarray([max(h, 1) for h in self.num_hots],
                           dtype=jnp.int32)
        fb = jnp.asarray(self.hot_fallback, dtype=bool)
        is_hot = hd >= 0
        # non-hot ids of a fallback field route into the hot table
        use_hot = is_hot | fb[None, :]
        hrow = jnp.where(is_hot, jnp.clip(hd, 0),
                         ids % nhot[None, :]) + hoff[None, :]
        crow = (ids % ncold[None, :]) + coff[None, :] + self.cold_base
        return jnp.where(use_hot, hrow, crow), use_hot

    def gather(self, state, ids):
        doff = jnp.asarray(self.dict_off, dtype=jnp.int32)
        gid = ids + doff[None, :]
        if self.mesh is not None:
            return self._gather_sharded(state, ids, gid)
        hd = state["hot_dict"][gid]
        row, use_hot = self._route(ids, hd)
        return state["table"][row], (row, use_hot)

    def _gather_sharded(self, state, ids, gid):
        """all_gather the dict ids, owners answer hot_dict lanes (one
        owner per lane => an int32 psum publishes exactly), route, then
        owner-compute gather + psum_scatter on the unified table.
        Traffic: M*4 (ids) + M*4 (dict psum) + M*D*4 (rows) per device
        scale — O(batch), never O(vocab)."""
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (_owner_rows, mesh_axes,
                                         owner_lookup_1d)
        from jax.sharding import PartitionSpec as P

        ax = mesh_axes(self.mesh)

        def f(tbl, hdic, ids_l, gid_l):
            b_l, f_l = ids_l.shape
            m = b_l * f_l
            me = jax.lax.axis_index(ax)
            all_gid = jax.lax.all_gather(gid_l.reshape(m), ax, tiled=True)
            all_ids = jax.lax.all_gather(ids_l.reshape(m), ax, tiled=True)
            hd_all = owner_lookup_1d(hdic, all_gid, ax)
            row_all, hot_all = self._route(
                all_ids.reshape(-1, f_l), hd_all.reshape(-1, f_l))
            rows = _owner_rows(tbl, row_all.reshape(-1), ax)
            out = jax.lax.psum_scatter(rows, ax, scatter_dimension=0,
                                       tiled=True)
            row_me = jax.lax.dynamic_slice(row_all.reshape(-1),
                                           (me * m,), (m,))
            hot_me = jax.lax.dynamic_slice(hot_all.reshape(-1),
                                           (me * m,), (m,))
            return (out.reshape(b_l, f_l, -1), row_me.reshape(b_l, f_l),
                    hot_me.reshape(b_l, f_l))

        raw, row, use_hot = shard_map(
            f, self.mesh,
            in_specs=(P(ax, None), P(ax), P(ax, None), P(ax, None)),
            out_specs=(P(ax, None, None), P(ax, None), P(ax, None)),
        )(state["table"], state["hot_dict"], ids, gid)
        return raw, (row, use_hot)

    def apply_grads(self, state, ids, g_raw, aux, lr):
        row, use_hot = aux
        b, f, d = g_raw.shape
        if self.mesh is not None:
            table, slots = self._sharded_apply(
                state["table"], self._slots_of(state, "table"), row,
                g_raw, lr)
            return self._put_slots({**state, "table": table}, "table",
                                   slots), {}
        state = self._table_update(state, "table", row.reshape(b * f),
                                   g_raw.reshape(b * f, d), lr)
        return state, {}

    def quantize_for_serving(self, state, bits):
        return {"table": self._quantize(state["table"], bits)}

    def gather_quantized(self, state, qt, ids):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        doff = jnp.asarray(self.dict_off, dtype=jnp.int32)
        gid = ids + doff[None, :]
        if self.mesh is not None:
            # hot_dict is row-sharded under the explicit exchange; a
            # direct state["hot_dict"][gid] would make the auto-
            # partitioner materialize the O(vocab) dict on every device
            # per eval batch — use the same owner-compute exchange as
            # the float path, with owners dequantizing their shard.
            return self._gather_quantized_sharded(state, qt, ids, gid)
        hd = state["hot_dict"][gid]
        row, _ = self._route(ids, hd)
        return dequantize_rows(qt["table"], row.reshape(-1)).reshape(
            b, f, -1)

    def _gather_quantized_sharded(self, state, qt, ids, gid):
        """_gather_sharded for the int4/int8 serving copy: dict lanes are
        answered by their owners, rows dequantized owner-side, f32 rows
        psum_scattered back — O(batch) traffic, never O(vocab)."""
        from ..ops.quantized import QuantizedTable, dequantize_rows
        from ..parallel.embedding_parallel import shard_map
        from ..parallel.exchange import (mesh_axes, owner_lookup_1d,
                                         owner_rows_with)
        from jax.sharding import PartitionSpec as P

        ax = mesh_axes(self.mesh)
        qtab = qt["table"]
        bits = qtab.bits

        def fwd(codes, scale, zero, hdic, ids_l, gid_l):
            b_l, f_l = ids_l.shape
            m = b_l * f_l
            all_gid = jax.lax.all_gather(gid_l.reshape(m), ax, tiled=True)
            all_ids = jax.lax.all_gather(ids_l.reshape(m), ax, tiled=True)
            hd_all = owner_lookup_1d(hdic, all_gid, ax)
            row_all, _ = self._route(all_ids.reshape(-1, f_l),
                                     hd_all.reshape(-1, f_l))
            local = QuantizedTable(codes, scale, zero, bits)
            vals = owner_rows_with(lambda i: dequantize_rows(local, i),
                                   codes.shape[0], row_all.reshape(-1), ax)
            out = jax.lax.psum_scatter(vals, ax, scatter_dimension=0,
                                       tiled=True)
            return out.reshape(b_l, f_l, -1)

        return shard_map(
            fwd, self.mesh,
            in_specs=(P(ax, None), P(ax, None), P(ax, None), P(ax),
                      P(ax, None), P(ax, None)),
            out_specs=P(ax, None, None),
        )(qtab.codes, qtab.scale, qtab.zero, state["hot_dict"], ids, gid)


class EmbeddingLayer:
    """Field-partitioned composite; mirrors the reference EmbeddingLayer
    dispatcher role (init_embed.py:18-223) as a functional object."""

    def __init__(self, parts: List[Part], num_fields: int, dim: int):
        assert sorted(sum((p.field_idx for p in parts), [])) == \
            list(range(num_fields))
        self.parts = parts
        self.num_fields = num_fields
        self.dim = dim
        order = np.concatenate([p.field_idx for p in parts]).astype(np.int64)
        self._perm = np.argsort(order)

    def set_mesh(self, mesh, unique_frac: float = 0.0,
                 exchange_mode: str = "explicit") -> List[str]:
        """Activate the explicit SPMD exchange (parallel/exchange.py) on
        every part that supports it — big hashed tables and CAFE parts
        (with shard-local sketches). Must run BEFORE init(); returns the
        names of the parts that activated (the rest stay replicated or
        auto-partitioned). unique_frac > 0 turns on the capacity-bounded
        unique-compact exchange on the parts that use the generic
        fetch/apply. exchange_mode selects the heavy row-leg collective
        (see Part.exchange_mode: explicit / a2a / pallas)."""
        active = []
        for i, p in enumerate(self.parts):
            if p.enable_mesh(mesh):
                p.unique_frac = float(unique_frac)
                p.exchange_mode = exchange_mode
                active.append(f"part{i}:{type(p).__name__}")
        return active

    def init(self, seed: int) -> Tuple[Dict, Dict]:
        rng = np.random.default_rng(seed)
        state = {f"part{i}": p.init(rng) for i, p in enumerate(self.parts)}
        dense = {f"part{i}": p.init_dense(rng)
                 for i, p in enumerate(self.parts)}
        return state, dense

    def gather(self, state: Dict, ids: jnp.ndarray):
        raws, auxs = {}, {}
        for i, p in enumerate(self.parts):
            cols = ids[:, np.asarray(p.field_idx)]
            raws[f"part{i}"], auxs[f"part{i}"] = p.gather(
                state[f"part{i}"], cols)
        return raws, auxs

    def transform(self, dense: Dict, raws: Dict) -> jnp.ndarray:
        feats = [p.transform(dense[f"part{i}"], raws[f"part{i}"])
                 for i, p in enumerate(self.parts)]
        return jnp.concatenate(feats, axis=1)[:, self._perm]

    def apply_grads(self, state: Dict, ids: jnp.ndarray, g_raws: Dict,
                    auxs: Dict, lr: float):
        # multiple parts can emit the same stat keys (one CafePart per
        # field under --cafe_hot_separate_field); combine rather than
        # letting the last part silently overwrite: counts sum, fractions
        # average over the parts that reported them
        collected: Dict[str, list] = {}
        new_state = {}
        for i, p in enumerate(self.parts):
            cols = ids[:, np.asarray(p.field_idx)]
            s, st = p.apply_grads(state[f"part{i}"], cols,
                                  g_raws[f"part{i}"], auxs[f"part{i}"], lr)
            new_state[f"part{i}"] = s
            for k, v in st.items():
                collected.setdefault(k, []).append(v)
        stats = {}
        for k, vs in collected.items():
            if len(vs) == 1:
                stats[k] = vs[0]
            elif k.endswith("_frac"):
                stats[k] = sum(vs) / len(vs)
            else:
                stats[k] = sum(vs)
        return new_state, stats

    def memory_rows(self) -> int:
        """Total embedding-table rows across all parts (compress-rate
        audits; note MDE/AE rows have reduced dims)."""
        rows = 0
        for p in self.parts:
            if isinstance(p, HashedTablePart):
                rows += p.rows
            elif isinstance(p, QRPart):
                rows += sum(p.q_rows) + sum(p.r_rows)
            elif isinstance(p, OffPart):
                rows += p.hot_rows + p.cold_rows
            elif hasattr(p, "total_rows"):      # CafePart unified table
                rows += p.total_rows
            elif hasattr(p, "hotn"):            # AdaPart global pool
                rows += p.hotn + 1
            elif hasattr(p, "counts"):          # MDE/AE reduced-dim tables
                rows += sum(p.counts)
        return rows
