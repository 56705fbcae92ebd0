"""Wide & Deep (functional). Reference: ArtifactEvaluation/models.py:76-91.

Faithful to the reference including its quirk that the deep tower's last
layer is already sigmoided before being summed with the wide logit and
sigmoided again (models.py:80, 89-91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import apply_mlp, init_mlp


class WDL:
    name = "wdl"

    def __init__(self, embedding_dim: int, num_sparse: int, num_dense: int,
                 ln_bot=None, ln_top=None, compute_dtype=jnp.float32):
        self.embedding_dim = embedding_dim
        self.num_sparse = num_sparse
        self.num_dense = num_dense
        self.input_dim = embedding_dim * num_sparse + num_dense
        self.ln_top = [self.input_dim, 256, 256, 1]
        self.compute_dtype = compute_dtype

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # reference re-inits the wide WEIGHT to normal(0, 1e-4)
        # (models.py:81) but leaves the bias at torch's nn.Linear default
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        wide_w = jax.random.normal(k1, (self.input_dim, 1),
                                   jnp.float32) * 1e-4
        bound = 1.0 / float(np.sqrt(self.input_dim))
        wide_b = jax.random.uniform(k3, (1,), jnp.float32,
                                    -bound, bound)
        return {
            "top": init_mlp(k2, self.ln_top),
            "wide": {"w": wide_w, "b": wide_b},
        }

    def apply(self, params, dense, feats):
        b = feats.shape[0]
        x = feats.reshape(b, -1)
        if dense is not None:
            x = jnp.concatenate([dense, x], axis=1)
        deep_p = apply_mlp(params["top"], x,
                           sigmoid_layer=len(self.ln_top) - 2,
                           compute_dtype=self.compute_dtype)
        wide_p = (jnp.dot(x.astype(self.compute_dtype),
                          params["wide"]["w"].astype(self.compute_dtype),
                          preferred_element_type=jnp.float32)
                  + params["wide"]["b"])
        return jax.nn.sigmoid(deep_p + wide_p)[:, 0]
