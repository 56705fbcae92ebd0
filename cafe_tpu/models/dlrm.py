"""DLRM dense towers (functional).

Reference: ArtifactEvaluation/models.py:50-73. Bottom MLP on dense features,
dot-product feature interaction (upper-triangular of T @ Tᵀ), top MLP with a
sigmoid output.

The upper-triangle extraction is done with a static boolean mask + reshape
(compile-time constant) instead of torch.triu_indices gathers — XLA folds it
into the batched matmul's consumer.

Legacy options (dlrm_s_pytorch.py): `interaction_op="cat"` concatenates
[bottom-MLP out ‖ flattened embeddings] instead of the dot interaction
(:810-812); `interaction_itself=True` keeps the diagonal of T@Tᵀ (:798);
`loss_threshold` clamps the output probability to [t, 1-t] (:845-848). The
reference extracts the strict *lower* triangle; Z is symmetric so the upper
triangle used here is the same set of interactions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .mlp import apply_mlp, init_mlp


class DLRM:
    name = "dlrm"

    def __init__(self, embedding_dim: int, num_sparse: int, num_dense: int,
                 ln_bot, ln_top, compute_dtype=jnp.float32,
                 interaction_op: str = "dot",
                 interaction_itself: bool = False,
                 loss_threshold: float = 0.0):
        self.embedding_dim = embedding_dim
        self.num_sparse = num_sparse
        self.num_dense = num_dense
        self.ln_bot = list(ln_bot)
        self.ln_top = list(ln_top)
        self.compute_dtype = compute_dtype
        assert interaction_op in ("dot", "cat"), interaction_op
        self.interaction_op = interaction_op
        self.loss_threshold = float(loss_threshold)
        nf = num_sparse + (1 if num_dense > 0 else 0)
        k = 0 if interaction_itself else 1
        self._triu = np.triu(np.ones((nf, nf), bool), k=k).reshape(-1)

    def init(self, key):
        import jax
        k1, k2 = jax.random.split(key)
        params = {"top": init_mlp(k2, self.ln_top)}
        if self.num_dense > 0:
            params["bot"] = init_mlp(k1, self.ln_bot)
        return params

    def interact(self, x, feats):
        # feats: [B, F, D]; x: [B, D] bottom-MLP output or None
        if self.interaction_op == "cat":
            r = feats.reshape(feats.shape[0], -1)
            if x is not None:
                r = jnp.concatenate([x, r], axis=1)
            return r
        if x is not None:
            t = jnp.concatenate([x[:, None, :], feats], axis=1)
        else:
            t = feats
        z = jnp.einsum("bfd,bgd->bfg", t.astype(self.compute_dtype),
                       t.astype(self.compute_dtype),
                       preferred_element_type=jnp.float32)
        r = z.reshape(z.shape[0], -1)[:, self._triu]
        if x is not None:
            r = jnp.concatenate([x, r], axis=1)
        return r

    def apply(self, params, dense, feats):
        """dense: [B, num_dense] | None; feats: [B, F, D] -> prob [B]."""
        x = None
        if dense is not None:
            x = apply_mlp(params["bot"], dense,
                          compute_dtype=self.compute_dtype)
        r = self.interact(x, feats)
        out = apply_mlp(params["top"], r,
                        sigmoid_layer=len(self.ln_top) - 2,
                        compute_dtype=self.compute_dtype)
        p = out[:, 0]
        if 0.0 < self.loss_threshold < 1.0:
            p = jnp.clip(p, self.loss_threshold, 1.0 - self.loss_threshold)
        return p
