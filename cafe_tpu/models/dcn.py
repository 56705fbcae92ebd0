"""Deep & Cross Network (functional). Reference: models.py:94-133.

Three cross layers y = x0 ⊙ (x1 @ w) + b (no residual term — faithful to
models.py:112-115), deep tower 256×3 with a sigmoid on its last layer
(models.py:110's create_mlp call), final linear on [deep ‖ cross] + sigmoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import apply_mlp, init_mlp


class DCN:
    name = "dcn"
    cross_layer_n = 3

    def __init__(self, embedding_dim: int, num_sparse: int, num_dense: int,
                 ln_bot=None, ln_top=None, compute_dtype=jnp.float32):
        self.embedding_dim = embedding_dim
        self.num_sparse = num_sparse
        self.num_dense = num_dense
        self.input_dim = embedding_dim * num_sparse + num_dense
        self.ln_top = [self.input_dim, 256, 256, 256]
        self.compute_dtype = compute_dtype

    def init(self, key):
        keys = jax.random.split(key, self.cross_layer_n + 2)
        cross = [
            {
                "w": jax.random.normal(keys[i], (self.input_dim, 1),
                                       jnp.float32) * 1e-4,
                "b": jnp.zeros((self.input_dim,), jnp.float32),
            }
            for i in range(self.cross_layer_n)
        ]
        k_last, k_top = keys[-2], keys[-1]
        last_in = self.input_dim + 256
        # torch nn.Linear default init (the reference leaves last_layer at
        # it, models.py:108): U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
        # weight and bias
        bound = 1.0 / float(np.sqrt(last_in))
        kw, kb = jax.random.split(k_last)
        last = {
            "w": jax.random.uniform(kw, (last_in, 1), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (1,), jnp.float32, -bound, bound),
        }
        return {"top": init_mlp(k_top, self.ln_top), "cross": cross,
                "last": last}

    def apply(self, params, dense, feats):
        b = feats.shape[0]
        x0 = feats.reshape(b, -1)
        if dense is not None:
            x0 = jnp.concatenate([dense, x0], axis=1)
        deep_p = apply_mlp(params["top"], x0,
                           sigmoid_layer=len(self.ln_top) - 2,
                           compute_dtype=self.compute_dtype)
        x1 = x0
        for layer in params["cross"]:
            x1w = jnp.dot(x1.astype(self.compute_dtype),
                          layer["w"].astype(self.compute_dtype),
                          preferred_element_type=jnp.float32)
            x1 = x0 * x1w + layer["b"]
        last_in = jnp.concatenate([deep_p, x1], axis=1)
        out = (jnp.dot(last_in.astype(self.compute_dtype),
                       params["last"]["w"].astype(self.compute_dtype),
                       preferred_element_type=jnp.float32)
               + params["last"]["b"])
        return jax.nn.sigmoid(out)[:, 0]
