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

from ..ops.sparse import sparse_adagrad, sparse_sgd

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

    # --- shared sparse-update helper ---------------------------------
    def _table_update(self, state: Dict, key: str, idx: jnp.ndarray,
                      grad: jnp.ndarray, lr: float) -> Dict:
        table = state[key]
        if self.optimizer == "adagrad":
            table, acc = sparse_adagrad(table, state[key + "_acc"], idx,
                                        grad, lr)
            return {**state, key: table, key + "_acc": acc}
        return {**state, key: sparse_sgd(table, idx, grad, lr)}

    def _maybe_acc(self, state: Dict, key: str) -> Dict:
        if self.optimizer == "adagrad":
            state[key + "_acc"] = jnp.zeros_like(state[key])
        return state


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
            from ..parallel.exchange import sharded_fetch
            rows = sharded_fetch(self.mesh, state["table"], flat)
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
        from ..parallel.exchange import sharded_apply
        acc = state.get(key + "_acc") if self.optimizer == "adagrad" \
            else None
        table, acc = sharded_apply(self.mesh, state[key], acc, idx2d, g3d,
                                   lr, self.optimizer)
        out = {**state, key: table}
        if acc is not None:
            out[key + "_acc"] = acc
        return out

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
        qv, rv = state["q"][qi], state["r"][ri]
        if self.operation == "add":
            raw = qv + rv
        elif self.operation == "mult":
            raw = qv * rv
        else:
            raw = jnp.concatenate([qv, rv], axis=-1)
        return raw, (qi, ri)

    def apply_grads(self, state, ids, g_raw, aux, lr):
        qi, ri = aux
        b, f, d = g_raw.shape
        g = g_raw.reshape(b * f, d)
        qi, ri = qi.reshape(-1), ri.reshape(-1)
        if self.operation == "add":
            gq, gr = g, g
        elif self.operation == "mult":
            gq = g * state["r"][ri]
            gr = g * state["q"][qi]
        else:
            gq, gr = g[:, :self.q_dim], g[:, self.q_dim:]
        state = self._table_update(state, "q", qi, gq, lr)
        state = self._table_update(state, "r", ri, gr, lr)
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
    padding row."""

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

    def init(self, rng):
        scales = [np.sqrt(1.0 / max(n, 5)) for n in self.counts]
        hd = self._hot_dict_np
        hd_pad = np.full(round_up(len(hd)), -1, dtype=np.int32)
        hd_pad[: len(hd)] = hd
        state = {
            "hot": jnp.asarray(_uniform_init(
                rng, [max(h, 1) for h in self.num_hots], scales, self.dim)),
            "cold": jnp.asarray(_uniform_init(
                rng, [max(c, 1) for c in self.num_colds], scales, self.dim)),
            "hot_dict": jnp.asarray(hd_pad),
        }
        state = self._maybe_acc(state, "hot")
        return self._maybe_acc(state, "cold")

    def gather(self, state, ids):
        doff = jnp.asarray(self.dict_off, dtype=jnp.int32)
        hoff = jnp.asarray(self.hot_off, dtype=jnp.int32)
        coff = jnp.asarray(self.cold_off, dtype=jnp.int32)
        ncold = jnp.asarray([max(c, 1) for c in self.num_colds],
                            dtype=jnp.int32)
        nhot = jnp.asarray([max(h, 1) for h in self.num_hots],
                           dtype=jnp.int32)
        fb = jnp.asarray(self.hot_fallback, dtype=bool)
        hd = state["hot_dict"][ids + doff[None, :]]
        is_hot = hd >= 0
        # non-hot ids of a fallback field route into the hot table
        use_hot = is_hot | fb[None, :]
        hrow = jnp.where(is_hot, jnp.clip(hd, 0),
                         ids % nhot[None, :]) + hoff[None, :]
        crow = (ids % ncold[None, :]) + coff[None, :]
        rows = jnp.where(use_hot[..., None], state["hot"][hrow],
                         state["cold"][crow])
        return rows, (hrow, crow, use_hot)

    def apply_grads(self, state, ids, g_raw, aux, lr):
        hrow, crow, use_hot = aux
        b, f, d = g_raw.shape
        g = g_raw.reshape(b * f, d)
        hi = jnp.where(use_hot, hrow, state["hot"].shape[0]).reshape(-1)
        ci = jnp.where(use_hot, state["cold"].shape[0], crow).reshape(-1)
        state = self._table_update(state, "hot", hi, g, lr)
        state = self._table_update(state, "cold", ci, g, lr)
        return state, {}

    def quantize_for_serving(self, state, bits):
        return {"hot": self._quantize(state["hot"], bits),
                "cold": self._quantize(state["cold"], bits)}

    def gather_quantized(self, state, qt, ids):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        _, (hrow, crow, use_hot) = self.gather(state, ids)
        hv = dequantize_rows(qt["hot"], hrow.reshape(-1)).reshape(b, f, -1)
        cv = dequantize_rows(qt["cold"], crow.reshape(-1)).reshape(b, f, -1)
        return jnp.where(use_hot[..., None], hv, cv)


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

    def set_mesh(self, mesh) -> List[str]:
        """Activate the explicit SPMD exchange (parallel/exchange.py) on
        every part that supports it — big hashed tables and CAFE parts
        (with shard-local sketches). Must run BEFORE init(); returns the
        names of the parts that activated (the rest stay replicated or
        auto-partitioned)."""
        return [f"part{i}:{type(p).__name__}"
                for i, p in enumerate(self.parts) if p.enable_mesh(mesh)]

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
