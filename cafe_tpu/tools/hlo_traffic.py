"""Collective-traffic audit of a compiled sharded step.

The XLA SPMD partitioner may legally satisfy a gather from a row-sharded
table by ALL-GATHERING THE TABLE — numerically correct, catastrophically
over the bandwidth budget. This tool parses the compiled HLO of a jitted
function and reports every collective with its payload size, so tests can
assert the sharded train step moves O(batch), never O(table), bytes
(VERDICT round 1: "prove the traffic").

Shapes in an SPMD-partitioned module are PER-PARTITION; an all-gather's
result shape is the post-gather (global-slice) buffer, which is the
closest proxy for bytes received per device.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "all-to-all", "collective-permute",
    "reduce-scatter",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"\b(pred|[suf](?:8|16|32|64)|bf16)\[([0-9,]*)\]")


class Collective(NamedTuple):
    op: str
    line: str
    result_bytes: int


def _shape_bytes(fragment: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(fragment):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> List[Collective]:
    """Every collective instruction with the byte size of its result
    shape(s). `-start` variants (async) are counted; `-done` are not
    (they carry the same buffer)."""
    out = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if "=" not in stripped:
            continue
        lhs, _, rhs = stripped.partition("=")
        for op in COLLECTIVE_OPS:
            # match `op(` or `op-start(`; exclude `op-done(`
            if re.search(rf"\b{op}(-start)?\(", rhs):
                # result shape(s) sit between '=' and the op token
                frag = rhs.split(op)[0]
                out.append(Collective(op, stripped, _shape_bytes(frag)))
                break
    return out


_GROUPS_LIST_RE = re.compile(r"replica_groups=\{((?:\{[^}]*\},?)+)\}")
_GROUPS_IOTA_RE = re.compile(
    r"replica_groups=\[(\d+),(\d+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?")


def collective_groups(line: str):
    """Parse an HLO collective's replica_groups into a list of device-id
    lists. Handles both the explicit `{{0,1},{2,3}}` form and the iota
    `[G,S]<=[dims]T(perm)` form. Returns None if absent/unparseable."""
    m = _GROUPS_LIST_RE.search(line)
    if m:
        return [[int(x) for x in g.split(",") if x.strip()]
                for g in re.findall(r"\{([^}]*)\}", m.group(1))]
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        import numpy as _np
        g, s = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        arr = _np.arange(int(_np.prod(dims))).reshape(dims)
        if m.group(4):
            perm = [int(x) for x in m.group(4).split(",")]
            arr = arr.transpose(perm)
        return arr.reshape(g, s).tolist()
    return None


def classify_axis(line: str, n_inner: int):
    """For a two-level (dcn, ici) mesh with `n_inner` chips per inner
    group (flat device id = dcn*n_inner + ici): 'ici' if every replica
    group stays within one inner block, 'dcn' if every group spans
    blocks at a fixed inner position, 'global'/'unknown' otherwise."""
    groups = collective_groups(line)
    if not groups:
        return "unknown"
    def block(d):
        return d // n_inner
    if all(len({block(d) for d in g}) == 1 for g in groups):
        return "ici"
    if all(len({d % n_inner for d in g}) == 1
           and len({block(d) for d in g}) == len(g) for g in groups):
        return "dcn"
    return "global"


def compiled_text(jitted, *args) -> str:
    return jitted.lower(*args).compile().as_text()


def audit(jitted, *args, max_bytes: int, label: str = "") -> List[Collective]:
    """Compile and return collectives whose payload exceeds max_bytes."""
    stats = collective_stats(compiled_text(jitted, *args))
    return [c for c in stats if c.result_bytes > max_bytes]


def model_result_bytes(m_lanes: int, dim: int, n: int, param_bytes: int,
                       method: str = "hash", mig_cap: int = 0,
                       hotn: int = 0) -> dict:
    """Analytic per-class prediction of the sharded step's collective
    RESULT bytes (the quantity collective_stats measures), at
    shard_unique_frac = 0 on a flat n-device mesh — the byte model of
    docs/PERF.md expressed in HLO-result terms so tool and tests can
    compare prediction to compiled reality per mesh size.

    Classes (exchange.py full path):
      ids_fwd    all_gather of the flattened int32 row ids   -> M*4
      rows_fwd   psum_scatter of owner-computed rows         -> M/n*D*4
      ids_bwd    all_gather of update row ids                -> M*4
      grads_bwd  all_gather of update grads                  -> M*D*4
      towers     DP dense-grad all-reduce                    -> P*4
      route      (cafe) owner-answer row-map psum + score AG -> 2*M*4
      migration  (cafe) bounded promo exchange: 3 int legs of
                 n*cap lanes + one n*cap x D row psum
    Wire bytes per device are the PERF.md statement: multiply AG/scatter
    entries by (n-1)/n and psums by 2(n-1)/n.
    """
    out = {
        "ids_fwd": m_lanes * 4,
        "rows_fwd": (m_lanes + n - 1) // n * dim * 4,
        "ids_bwd": m_lanes * 4,
        "grads_bwd": m_lanes * dim * 4,
        "towers": param_bytes,
    }
    if method == "cafe":
        out["route"] = 2 * m_lanes * 4
        # per-shard migration lanes: min(mig_lanes, s_l - 1) where s_l is
        # the shard-local bucket count (cafe.py _apply_sharded p_cap) —
        # at large n the shard slice, not the config cap, binds
        cap = mig_cap or 256
        if hotn:
            cap = min(cap, max(hotn // n - 1, 1))
        out["migration"] = n * cap * (3 * 4 + dim * 4)
    total = sum(out.values())
    out["total"] = total
    return out
