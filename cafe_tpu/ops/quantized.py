"""Row-wise quantized embedding tables for inference.

Reference capability: the legacy driver serves 4/8-bit row-wise quantized
EmbeddingBags at inference (dlrm_s_pytorch.py:628-659 via
fbgemm embedding_bag_{4,8}bit_rowwise_offsets). Same scheme here: each row
stores uint codes plus an f32 (scale, zero) pair; dequantization happens in
the gather consumer, so lookup bandwidth drops 4x/8x — useful when serving
tables from HBM at high QPS.

int4 packs two codes per uint8 byte (even column in the low nibble).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuantizedTable(NamedTuple):
    codes: jnp.ndarray   # uint8 [N, D] (int8) or [N, D//2] (int4 packed)
    scale: jnp.ndarray   # f32 [N, 1]
    zero: jnp.ndarray    # f32 [N, 1]
    bits: int


def quantize_rowwise(table: jnp.ndarray, bits: int = 8) -> QuantizedTable:
    assert bits in (4, 8)
    table = jnp.asarray(table)  # host pytrees welcome (post-device_get)
    levels = (1 << bits) - 1
    lo = table.min(axis=1, keepdims=True)
    hi = table.max(axis=1, keepdims=True)
    scale = jnp.maximum(hi - lo, 1e-12) / levels
    q = jnp.clip(jnp.round((table - lo) / scale), 0, levels)
    q = q.astype(jnp.uint8)
    if bits == 4:
        assert table.shape[1] % 2 == 0
        q = (q[:, 0::2] | (q[:, 1::2] << 4)).astype(jnp.uint8)
    return QuantizedTable(codes=q, scale=scale, zero=lo, bits=bits)


def dequantize_rows(qt: QuantizedTable, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather + dequantize rows at `idx` -> f32 [B, D]."""
    codes = qt.codes[idx]
    if qt.bits == 4:
        lo_nib = (codes & 0x0F).astype(jnp.float32)
        hi_nib = (codes >> 4).astype(jnp.float32)
        b, half = codes.shape
        vals = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(b, half * 2)
    else:
        vals = codes.astype(jnp.float32)
    return vals * qt.scale[idx] + qt.zero[idx]


def quantization_error(table: jnp.ndarray, bits: int) -> float:
    qt = quantize_rowwise(table, bits)
    idx = jnp.arange(table.shape[0])
    return float(jnp.abs(dequantize_rows(qt, idx) - table).max())
