"""LightGCN with optional CAFE-compressed embeddings.

Reference: TOIS_revision/LightGCN/code/model.py:84-204 (BPR-trained
LightGCN; `computer()` propagates the concatenated user+item table through
the symmetric-normalized adjacency n_layers times and averages the layer
outputs) and world.py's config (3 layers, dim 64, compress_rate 0.1,
hot_rate 0.7). The reference's CAFE wiring there is broken in-snapshot
(SURVEY.md §2.3); this module implements the *intent*: the node-id
embedding table is a CAFE hot/hash pair behind a HotSketch, trained online
with grad-norm importance.

TPU mapping: the sparse adjacency matmul becomes gather + segment-sum over
a static COO edge list (jit/scan friendly, rides HBM bandwidth); the whole
BPR step (propagate -> loss -> backward -> sketch update -> scatter
updates) is one jitted function.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...embeddings.base import HashedTablePart
from ...embeddings.cafe import CafePart


class Graph(NamedTuple):
    src: np.ndarray     # int32 [E*2] (bidirected, user/item unified space)
    dst: np.ndarray     # int32 [E*2]
    w: np.ndarray       # f32   [E*2] 1/sqrt(deg_src*deg_dst)
    n_users: int
    n_items: int


def build_bipartite_graph(users: np.ndarray, items: np.ndarray,
                          n_users: int, n_items: int) -> Graph:
    """Symmetric-normalized bidirected interaction graph; item ids offset by
    n_users into the unified node space (model.py's getSparseGraph)."""
    u = np.asarray(users, dtype=np.int64)
    i = np.asarray(items, dtype=np.int64) + n_users
    src = np.concatenate([u, i]).astype(np.int32)
    dst = np.concatenate([i, u]).astype(np.int32)
    n = n_users + n_items
    deg = np.bincount(src, minlength=n).astype(np.float64)
    deg[deg == 0] = 1.0
    w = (1.0 / np.sqrt(deg[src] * deg[dst])).astype(np.float32)
    return Graph(src, dst, w, n_users, n_items)


@dataclasses.dataclass
class LightGCNConfig:
    latent_dim: int = 64
    n_layers: int = 3
    lr: float = 0.001
    weight_decay: float = 1e-4   # BPR reg coefficient
    compress_rate: float = 1.0   # 1.0 = full table
    hot_rate: float = 0.7        # world.py:49 (CAFE share going to hot)
    sketch_threshold: float = 500.0
    sketch_decay: float = 0.99
    seed: int = 0
    # the reference trains with Adam (LightGCN/code/utils.py:39, lr 0.001
    # per world.py); rows-Adam (ops/sparse.py) is the sparse-table form.
    # sgd/adagrad kept for ablations.
    optimizer: str = "adam"      # sgd | adagrad | adam


class LightGCN:
    def __init__(self, cfg: LightGCNConfig, graph: Graph):
        self.cfg = cfg
        self.graph = graph
        self.n_nodes = graph.n_users + graph.n_items
        d = cfg.latent_dim
        if cfg.compress_rate < 1.0:
            size = int(self.n_nodes * cfg.compress_rate)
            hotn = max(int(size * cfg.hot_rate * d / (d + 12)), 2)
            hash_size = max(size - hotn, 1)
            self.part = CafePart(
                [0], [self.n_nodes], [0], hotn, [hash_size], d,
                cfg.sketch_threshold, cfg.sketch_decay, self.n_nodes,
                optimizer=cfg.optimizer)
        else:
            self.part = HashedTablePart([0], [self.n_nodes],
                                        [self.n_nodes], d,
                                        optimizer=cfg.optimizer)
        self._src = jnp.asarray(graph.src)
        self._dst = jnp.asarray(graph.dst)
        self._w = jnp.asarray(graph.w)

    def init(self) -> dict:
        rng = np.random.default_rng(self.cfg.seed)
        state = self.part.init(rng)
        # reference init: normal(std=0.1) on the node embedding
        # (model.py:111-117 nn.init.normal_(std=0.1)); the CTR-table
        # sqrt(1/n) scale is far too small at graph-scale vocabularies for
        # BPR to escape its flat cold-start region.
        state = {**state, "table": jnp.asarray(
            rng.normal(0.0, 0.1, state["table"].shape).astype(np.float32))}
        return state

    # -- propagation (model.py:129-161) --------------------------------
    def propagate(self, emb0: jnp.ndarray) -> jnp.ndarray:
        out = emb0
        acc = emb0
        for _ in range(self.cfg.n_layers):
            msgs = out[self._src] * self._w[:, None]
            out = jax.ops.segment_sum(msgs, self._dst,
                                      num_segments=self.n_nodes)
            acc = acc + out
        return acc / (self.cfg.n_layers + 1)

    def _table(self, state) -> Tuple[jnp.ndarray, tuple]:
        ids = jnp.arange(self.n_nodes, dtype=jnp.int32)[:, None]
        raw, aux = self.part.gather(state, ids)
        return raw[:, 0, :], aux

    def bpr_step(self, state: dict, users, pos, neg
                 ) -> Tuple[dict, jnp.ndarray]:
        """One BPR update (model.py:181-196) with CAFE bookkeeping."""
        cfg = self.cfg
        pos_n = pos + self.graph.n_users
        neg_n = neg + self.graph.n_users

        raw, aux = self._table(state)

        def loss_fn(emb0):
            light = self.propagate(emb0)
            ue, pe, ne = light[users], light[pos_n], light[neg_n]
            pos_s = jnp.sum(ue * pe, axis=1)
            neg_s = jnp.sum(ue * ne, axis=1)
            loss = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            ego = jnp.concatenate([emb0[users], emb0[pos_n], emb0[neg_n]])
            reg = 0.5 * jnp.sum(ego * ego) / users.shape[0]
            return loss + cfg.weight_decay * reg

        loss, g = jax.value_and_grad(loss_fn)(raw)
        ids = jnp.arange(self.n_nodes, dtype=jnp.int32)[:, None]
        state, _ = self.part.apply_grads(state, ids, g[:, None, :], aux,
                                         cfg.lr)
        return state, loss

    def jit_step(self):
        return jax.jit(self.bpr_step)

    # -- evaluation -----------------------------------------------------
    def scores(self, state: dict, users: np.ndarray) -> jnp.ndarray:
        raw, _ = self._table(state)
        light = self.propagate(raw)
        ue = light[jnp.asarray(users)]
        items = light[self.graph.n_users:]
        return ue @ items.T

    def recall_at_k(self, state: dict, train_pos, test_pos,
                    k: int = 20) -> float:
        """recall@k / users with test interactions, train items masked."""
        users = np.array([u for u in range(self.graph.n_users)
                          if len(test_pos[u]) > 0])
        if len(users) == 0:
            return 0.0
        s = np.array(self.scores(state, users))
        for r, u in enumerate(users):
            s[r, train_pos[u]] = -1e9
        topk = np.argpartition(-s, min(k, s.shape[1] - 1), axis=1)[:, :k]
        recall = 0.0
        for r, u in enumerate(users):
            hits = len(set(topk[r].tolist()) & set(test_pos[u].tolist()))
            recall += hits / min(len(test_pos[u]), k)
        return recall / len(users)
