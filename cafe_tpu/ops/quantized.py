"""Row-wise quantized embedding tables for inference.

Reference capability: the legacy driver serves 4/8-bit row-wise quantized
EmbeddingBags at inference (dlrm_s_pytorch.py:628-659 via
fbgemm embedding_bag_{4,8}bit_rowwise_offsets). Same scheme here: each row
stores uint codes plus an f32 (scale, zero) pair; dequantization happens in
the gather consumer.

TPU layout (round 5): random-row lookups on this hardware are per-ROW
latency-bound, not bandwidth-bound (docs/PERF.md roofline) — the
original (codes, scale, zero) triple-gather made int8 serving 2x SLOWER
than fp32 (3 row-gathers vs 1; serving_bench.txt history). And the
gather engine wants WIDE rows: an int32 [N, 34] word-packed row
gathered 3x slower than uint8 [N, 136] at the same bytes (on-chip
probe). The layout is therefore one uint8 row per table row:

    [cw code bytes][4 bytes f32 scale][4 bytes f32 zero]

ONE gather per lookup; the code bytes are consumed in place and the
scale/zero reconstruct with bitcasts — measured at fp32-gather parity
(7.7 vs 6.9 ms at 426k serving lanes) with 3.8x less table memory.
int4 packs two codes per byte PLANE-MAJOR (byte j holds dims j and
j + D/2), so its unpack is a channel concat, not an element interleave
(an interleaved order costs a [B, D/2, 2] relayout per lookup).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTable(NamedTuple):
    codes: jnp.ndarray   # uint8 [N, cw + 8]: code bytes + f32 scale +
    #                      f32 zero bytes (cw = D for int8, D/2 for int4)
    scale: jnp.ndarray   # f32 [N, 1] (kept for sharded row-slicing)
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
        half = table.shape[1] // 2
        q = (q[:, :half] | (q[:, half:] << 4)).astype(jnp.uint8)
    sb = jax.lax.bitcast_convert_type(
        scale.astype(jnp.float32), jnp.uint8).reshape(q.shape[0], 4)
    zb = jax.lax.bitcast_convert_type(
        lo.astype(jnp.float32), jnp.uint8).reshape(q.shape[0], 4)
    codes = jnp.concatenate([q, sb, zb], axis=1)
    return QuantizedTable(codes=codes, scale=scale, zero=lo, bits=bits)


def dequantize_rows(qt: QuantizedTable, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather + dequantize rows at `idx` -> f32 [B, D]. ONE row gather
    (see module docstring)."""
    rows = qt.codes[idx]
    cw = rows.shape[1] - 8
    codes = rows[:, :cw]
    scale = jax.lax.bitcast_convert_type(
        rows[:, cw:cw + 4].reshape(-1, 1, 4), jnp.float32)
    zero = jax.lax.bitcast_convert_type(
        rows[:, cw + 4:cw + 8].reshape(-1, 1, 4), jnp.float32)
    if qt.bits == 4:
        # plane-major nibbles (see quantize_rowwise): channel concat
        codes = jnp.concatenate(
            [codes & 0x0F, (codes >> 4) & 0x0F], axis=1)
    return codes.astype(jnp.float32) * scale + zero


def quantization_error(table: jnp.ndarray, bits: int) -> float:
    qt = quantize_rowwise(table, bits)
    idx = jnp.arange(table.shape[0])
    return float(jnp.abs(dequantize_rows(qt, idx) - table).max())
