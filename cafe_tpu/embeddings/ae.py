"""AutoEncoder embedding baseline.

Reference: tricks/autoencoder.py + the driver autoencoder.py — per field a
reduced-dim table (MDE-style dim assignment) with a projection back to the
base dim, plus a decoder fc1 (base->low) / fc2 (low->vocab) that
reconstructs the one-hot id. The autoencoders are pretrained on the first
0.001% of batches with per-table SGD lr 0.1 (autoencoder.py:240, 441-465,
1383), after which the embeddings are served FROZEN via get_emb (no_grad,
autoencoder.py:31-36, 516).

Scaling note (faithful to the reference): the decoder's fc2 is [low, vocab]
— reconstruction materializes [batch, vocab] logits, so pretraining cost
grows with vocabulary size. The reference has the same property
(autoencoder.py:446-452).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .base import Part, _offsets, round_up

AE_LR = 0.1
PRETRAIN_FRACTION = 1e-5  # autoencoder.py:1383: j < l * 0.00001


class AEGroupPart(Part):
    """Fields sharing one reduced dim; embeddings frozen after pretraining."""

    def __init__(self, field_idx: List[int], counts: List[int],
                 low_dim: int, base_dim: int, optimizer: str = "sgd"):
        self.field_idx = list(field_idx)
        self.counts = [int(c) for c in counts]
        self.low_dim = int(low_dim)
        self.dim = base_dim
        self.optimizer = optimizer
        self.np_offsets = _offsets(self.counts)
        self.max_n = max(self.counts)

    def init(self, rng: np.random.Generator) -> Dict:
        f = len(self.field_idx)
        total = int(sum(self.counts))
        table = np.zeros((round_up(total), self.low_dim), dtype=np.float32)
        lo = 0
        for n in self.counts:
            scale = np.sqrt(1.0 / n)  # autoencoder.py:231-234
            table[lo:lo + n] = rng.uniform(
                -scale, scale, size=(n, self.low_dim)).astype(np.float32)
            lo += n
        def xav(shape):
            bound = np.sqrt(6.0 / (shape[-2] + shape[-1]))
            return rng.uniform(-bound, bound, size=shape).astype(np.float32)
        state = {
            "table": jnp.asarray(table),
            # per-field dense pieces, stacked on a leading field axis
            "proj_w": jnp.asarray(xav((f, self.low_dim, self.dim))),
            "proj_b": jnp.zeros((f, self.dim), jnp.float32),
            "fc1_w": jnp.asarray(xav((f, self.dim, self.low_dim))),
            "fc1_b": jnp.zeros((f, self.low_dim), jnp.float32),
            # fc2 maps low -> vocab; padded to the max field vocab
            "fc2_w": jnp.asarray(xav((f, self.low_dim, self.max_n))),
            "fc2_b": jnp.zeros((f, self.max_n), jnp.float32),
        }
        return state

    def _embed(self, state, ids):
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = ids + off[None, :]
        low = state["table"][flat]                       # [B, F, low]
        if self.low_dim == self.dim:
            return low, flat
        out = jnp.einsum("bfd,fde->bfe", low, state["proj_w"]) \
            + state["proj_b"][None]
        return out, flat

    def gather(self, state: Dict, ids: jnp.ndarray):
        raw, flat = self._embed(state, ids)
        # frozen embedding: block gradients like the reference's no_grad
        return jax.lax.stop_gradient(raw), flat

    def apply_grads(self, state, ids, g_raw, aux, lr):
        return state, {}  # frozen after pretraining

    def quantize_for_serving(self, state: Dict, bits: int) -> Dict:
        return {"table": self._quantize(state["table"], bits)}

    def gather_quantized(self, state: Dict, qt: Dict, ids: jnp.ndarray):
        from ..ops.quantized import dequantize_rows
        b, f = ids.shape
        off = jnp.asarray(self.np_offsets, dtype=jnp.int32)
        flat = ids + off[None, :]
        low = dequantize_rows(qt["table"], flat.reshape(-1)).reshape(
            b, f, -1)
        if self.low_dim == self.dim:
            return low
        return jnp.einsum("bfd,fde->bfe", low, state["proj_w"]) \
            + state["proj_b"][None]

    # ---- pretraining ------------------------------------------------
    def pretrain_step(self, state: Dict, ids: jnp.ndarray) -> Dict:
        """One AE reconstruction step (autoencoder.py:441-465): per field,
        MSE between fc2(fc1(proj(emb))) and the one-hot id, summed over the
        vocab, averaged over the batch; SGD on all AE params."""
        b, f = ids.shape
        mask = jnp.asarray(
            np.arange(self.max_n)[None, :]
            < np.asarray(self.counts)[:, None])   # [F, max_n] valid vocab

        def loss_fn(st):
            emb, flat = self._embed(st, ids)             # [B, F, D]
            h = jnp.einsum("bfe,fed->bfd", emb, st["fc1_w"]) \
                + st["fc1_b"][None]
            v = jnp.einsum("bfd,fdn->bfn", h, st["fc2_w"]) \
                + st["fc2_b"][None]                       # [B, F, max_n]
            onehot = jax.nn.one_hot(ids, self.max_n, dtype=v.dtype)
            diff = (v - onehot) * mask[None]
            return jnp.sum(diff * diff) / b

        grads = jax.grad(loss_fn)(state)
        return jax.tree.map(lambda p, g: p - AE_LR * g, state, grads)


def pretrain_batches(nbatches: int) -> int:
    return max(1, int(nbatches * PRETRAIN_FRACTION))
