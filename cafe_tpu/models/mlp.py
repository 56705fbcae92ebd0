"""Functional MLP with the reference's initialization.

Reference: ArtifactEvaluation/models.py:28-42 — weights ~ N(0, sqrt(2/(m+n))),
biases ~ N(0, sqrt(1/m)), ReLU between layers, sigmoid at `sigmoid_layer`.

Params are plain pytrees (list of dicts), matmuls run in `compute_dtype`
(bfloat16 on TPU feeds the MXU at full rate) with float32 accumulation and
float32 master params.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(key: jax.Array, ln: Sequence[int],
             sigmoid_layer: int = -1) -> List[dict]:
    params = []
    ln = list(ln)
    for i in range(len(ln) - 1):
        n, m = int(ln[i]), int(ln[i + 1])
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (n, m), jnp.float32) * np.sqrt(2.0 / (m + n))
        b = jax.random.normal(k2, (m,), jnp.float32) * np.sqrt(1.0 / m)
        params.append({"w": w, "b": b})
    return params


def apply_mlp(params: List[dict], x: jnp.ndarray, sigmoid_layer: int = -1,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    for i, layer in enumerate(params):
        x = jnp.dot(x.astype(compute_dtype),
                    layer["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) + layer["b"]
        if i == sigmoid_layer:
            x = jax.nn.sigmoid(x)
        else:
            x = jax.nn.relu(x)
    return x
