"""PinSAGE item-to-item recommender with CAFE-compressed item embeddings.

Reference: TOIS_revision/PinSAGE/{model.py,layers.py,sampler.py} — a DGL
pipeline: random-walk neighbor sampling on the user-item bipartite graph,
two weighted-SAGE convolutions, max-margin ranking loss
(model.py:30-34: clamp(neg - pos + 1, min=0)), and the item-id embedding
swapped for a CAFE SKEmbedding when compress_ratio > 1 (layers.py:29-57,
sizing hash = size*0.5, hotn = (size-hash)*dim/(dim+13)).

Here the sampler is a vectorized numpy random-walk (item->user->item hops
with visit-count top-T truncation — the PinSAGE importance-sampling trick),
and the convolutions + loss + CAFE updates run as one jitted step on
static [batch, T] neighbor blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...embeddings.base import HashedTablePart
from ...embeddings.cafe import CafePart


class RandomWalkSampler:
    """Item->user->item random walks; neighbors ranked by visit count.

    Equivalent role to dgl.sampling.RandomWalkNeighborSampler as used in
    sampler.py (num_random_walks, num_neighbors): for each seed item run
    `walks` 2-hop walks and keep the top `T` most-visited items with their
    visit counts as edge weights.
    """

    def __init__(self, user_items: List[np.ndarray],
                 item_users: List[np.ndarray], walks: int = 10,
                 top_t: int = 3, seed: int = 0):
        self.user_items = user_items
        self.item_users = item_users
        self.walks = walks
        self.top_t = top_t
        self.rng = np.random.default_rng(seed)

    def sample(self, seeds: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """-> (neighbors [B, T] int32, weights [B, T] f32); self-loop pads
        seeds with no reachable neighbors."""
        b = len(seeds)
        nbrs = np.tile(seeds[:, None], (1, self.top_t)).astype(np.int32)
        wts = np.zeros((b, self.top_t), dtype=np.float32)
        wts[:, 0] = 1.0
        for i, s in enumerate(seeds):
            visits: Dict[int, int] = {}
            us = self.item_users[int(s)]
            if len(us) == 0:
                continue
            for _ in range(self.walks):
                u = us[self.rng.integers(0, len(us))]
                its = self.user_items[int(u)]
                if len(its) == 0:
                    continue
                it = int(its[self.rng.integers(0, len(its))])
                if it != int(s):
                    visits[it] = visits.get(it, 0) + 1
            if not visits:
                continue
            top = sorted(visits.items(), key=lambda kv: -kv[1])[: self.top_t]
            for j, (it, c) in enumerate(top):
                nbrs[i, j] = it
                wts[i, j] = c
        return nbrs, wts

    def pos_pairs(self, batch: int) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
        """(head, pos, neg) item triples: pos reached by a 2-hop walk from
        head, neg uniform (sampler.py's ItemToItemBatchSampler)."""
        n_items = len(self.item_users)
        heads = self.rng.integers(0, n_items, batch).astype(np.int32)
        pos = heads.copy()
        for i, h in enumerate(heads):
            us = self.item_users[int(h)]
            if len(us) == 0:
                continue
            u = us[self.rng.integers(0, len(us))]
            its = self.user_items[int(u)]
            if len(its):
                pos[i] = its[self.rng.integers(0, len(its))]
        neg = self.rng.integers(0, n_items, batch).astype(np.int32)
        return heads, pos, neg


@dataclasses.dataclass
class PinSAGEConfig:
    hidden_dims: int = 16
    n_layers: int = 2
    lr: float = 0.01
    compress_ratio: int = 1      # >1 enables CAFE (layers.py:81-90)
    sketch_threshold: float = 500.0
    seed: int = 0
    # applies to BOTH the conv params (dense Adam) and the embedding table
    # (rows-Adam, ops/sparse.py). The reference trains with Adam
    # (PinSAGE/model.py:133); sgd/adagrad kept for ablations.
    optimizer: str = "adam"      # sgd | adagrad | adam


class PinSAGE:
    def __init__(self, cfg: PinSAGEConfig, n_items: int):
        self.cfg = cfg
        self.n_items = n_items
        d = cfg.hidden_dims
        if cfg.compress_ratio > 1:
            size = n_items // cfg.compress_ratio
            hash_size = int(size * 0.5)          # layers.py:32-33
            hotn = max(int(size - hash_size) * d // (d + 13), 2)
            hash_size = max(hash_size, 1)
            self.part = CafePart([0], [n_items], [0], hotn, [hash_size], d,
                                 cfg.sketch_threshold, 0.99, n_items,
                                 optimizer=cfg.optimizer)
        else:
            self.part = HashedTablePart([0], [n_items], [n_items], d,
                                        optimizer=cfg.optimizer)

    def init(self) -> Dict:
        rng = np.random.default_rng(self.cfg.seed)
        state = {"embed": self.part.init(rng)}
        d = self.cfg.hidden_dims

        def xav(shape):
            bound = np.sqrt(6.0 / (shape[0] + shape[1]))
            return jnp.asarray(rng.uniform(-bound, bound, shape)
                               .astype(np.float32))

        for li in range(self.cfg.n_layers):
            state[f"conv{li}"] = {
                "wn": xav((d, d)), "bn": jnp.zeros((d,), jnp.float32),
                "wo": xav((2 * d, d)), "bo": jnp.zeros((d,), jnp.float32),
            }
        from ...train.step import init_dense_opt
        convs = [state[f"conv{li}"] for li in range(self.cfg.n_layers)]
        state["opt"] = init_dense_opt(convs, self.cfg.optimizer)
        return state

    # -- weighted SAGE conv (layers.py WeightedSAGEConv) ----------------
    def _conv(self, p, h_self, h_nbr, w):
        """h_nbr [B, T, D], w [B, T] -> [B, D]."""
        m = jax.nn.relu(h_nbr @ p["wn"] + p["bn"])
        agg = jnp.sum(m * w[..., None], axis=1) / (
            jnp.sum(w, axis=1, keepdims=True) + 1e-9)
        z = jax.nn.relu(
            jnp.concatenate([h_self, agg], axis=1) @ p["wo"] + p["bo"])
        return z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-9)

    def _representation(self, state, ego_rows, nbr_rows1, w1,
                        nbr_rows2, w2):
        """Two-layer PinSAGE: layer-1 conv over the 2-hop block is folded
        into the neighbor features of layer 2 (standard block form).

        ego_rows [B, D]; nbr_rows1 [B, T, D] (1-hop neighbors' features);
        nbr_rows2 [B, T, T, D] (their neighbors); w* matching weights."""
        b, t, d = nbr_rows1.shape
        if self.cfg.n_layers == 2:
            flat_self = nbr_rows1.reshape(b * t, d)
            flat_nbr = nbr_rows2.reshape(b * t, t, d)
            flat_w = w2.reshape(b * t, t)
            h1 = self._conv(state["conv0"], flat_self, flat_nbr, flat_w)
            h1 = h1.reshape(b, t, d)
            ego1 = self._conv(state["conv0"], ego_rows, nbr_rows1, w1)
            return self._conv(state["conv1"], ego1, h1, w1)
        return self._conv(state["conv0"], ego_rows, nbr_rows1, w1)

    def train_step(self, state: Dict, batch: Dict, lr: float
                   ) -> Tuple[Dict, jnp.ndarray]:
        """Max-margin step (model.py:30-34) over (head, pos, neg) triples;
        item features come through the (possibly CAFE) embedding."""
        ids = batch["ids"]          # [3B, 1] all item ids used (stacked)
        raw, aux = self.part.gather(state["embed"], ids)
        conv_keys = [f"conv{li}" for li in range(self.cfg.n_layers)]

        def loss_fn(convs, raw):
            st = {**state, **dict(zip(conv_keys, convs))}
            feats = raw[:, 0, :]
            g = lambda idx: feats[idx]  # noqa: E731
            z = self._representation(
                st, g(batch["ego_pos"]),
                g(batch["nbr1_pos"]), batch["w1"],
                g(batch["nbr2_pos"]), batch["w2"])
            b3 = z.shape[0] // 3
            zh, zp, zn = z[:b3], z[b3:2 * b3], z[2 * b3:]
            pos_s = jnp.sum(zh * zp, axis=1)
            neg_s = jnp.sum(zh * zn, axis=1)
            return jnp.mean(jnp.clip(neg_s - pos_s + 1.0, 0.0))

        convs = [state[k] for k in conv_keys]
        loss, (g_convs, g_raw) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(convs, raw)
        from ...train.step import _dense_update
        new_convs, new_opt = _dense_update(convs, list(g_convs),
                                           state.get("opt"), lr,
                                           self.cfg.optimizer)
        new_state = dict(state)
        new_state["opt"] = new_opt
        for k, cur in zip(conv_keys, new_convs):
            new_state[k] = cur
        embed, _ = self.part.apply_grads(state["embed"], ids, g_raw, aux,
                                         lr)
        new_state["embed"] = embed
        return new_state, loss

    def make_block(self, sampler: RandomWalkSampler,
                   seeds: np.ndarray) -> Dict:
        """Assemble a static-shape conv block for arbitrary seed items."""
        t = sampler.top_t
        n1, w1 = sampler.sample(seeds)                  # [S, T]
        n2 = np.empty((len(seeds), t, t), dtype=np.int32)
        w2 = np.empty((len(seeds), t, t), dtype=np.float32)
        for j in range(t):
            nj, wj = sampler.sample(n1[:, j])
            n2[:, j] = nj
            w2[:, j] = wj
        return self._pack_block(seeds, n1, w1, n2, w2)

    def make_batch(self, sampler: RandomWalkSampler, batch: int) -> Dict:
        """Assemble a static-shape training block for (head, pos, neg)."""
        heads, pos, neg = sampler.pos_pairs(batch)
        seeds = np.concatenate([heads, pos, neg])  # [3B]
        return self.make_block(sampler, seeds)

    def _pack_block(self, seeds, n1, w1, n2, w2) -> Dict:
        # unique ids referenced; positions into the gathered table. Padded
        # to a fixed capacity so the jitted step never recompiles (padding
        # repeats uniq[0]; no position references the padded lanes, so
        # their gradients are zero and updates no-ops).
        all_ids = np.concatenate(
            [seeds, n1.reshape(-1), n2.reshape(-1)]).astype(np.int32)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        cap = len(all_ids)
        uniq_p = np.full(cap, uniq[0], dtype=np.int32)
        uniq_p[: len(uniq)] = uniq
        uniq = uniq_p
        s = len(seeds)
        ego_pos = inv[:s]
        nbr1_pos = inv[s:s + n1.size].reshape(n1.shape)
        nbr2_pos = inv[s + n1.size:].reshape(n2.shape)
        return {
            "ids": jnp.asarray(uniq[:, None]),
            "ego_pos": jnp.asarray(ego_pos),
            "nbr1_pos": jnp.asarray(nbr1_pos),
            "nbr2_pos": jnp.asarray(nbr2_pos),
            "w1": jnp.asarray(w1),
            "w2": jnp.asarray(w2),
        }

    def representation_step(self, state: Dict, block: Dict) -> jnp.ndarray:
        """Item representations for a block's seeds (inference; jit me)."""
        raw, _ = self.part.gather(state["embed"], block["ids"])
        feats = raw[:, 0, :]
        g = lambda idx: feats[idx]  # noqa: E731
        return self._representation(
            state, g(block["ego_pos"]),
            g(block["nbr1_pos"]), block["w1"],
            g(block["nbr2_pos"]), block["w2"])

    def represent_items(self, state: Dict, sampler: RandomWalkSampler,
                        batch: int = 256) -> np.ndarray:
        """[n_items, D] representations of every item (evaluation.py's
        h_item), computed in fixed-shape blocks."""
        if not hasattr(self, "_rep_jit"):
            import jax
            self._rep_jit = jax.jit(self.representation_step)
        rep_fn = self._rep_jit
        out = np.empty((self.n_items, self.cfg.hidden_dims), np.float32)
        for lo in range(0, self.n_items, batch):
            ids = np.arange(lo, min(lo + batch, self.n_items),
                            dtype=np.int32)
            pad = batch - len(ids)
            seeds = np.concatenate([ids, np.zeros(pad, np.int32)])
            z = rep_fn(state, self.make_block(sampler, seeds))
            out[lo:lo + len(ids)] = np.asarray(z)[: len(ids)]
        return out
