"""Remote-DMA all-to-all prototype on the pallas_gather scaffold.

The sharded embedding exchange (parallel/exchange.py) moves per-device
[n, C, D] request/row buffers between shards with XLA collectives
(all_to_all lowered from shard_map's psum/ppermute plumbing). This
kernel is the hand-scheduled alternative SURVEY §2.6 leaves open and
VERDICT r3 item 9 asked to keep honest: each device issues n-1 direct
remote DMAs (one per peer, routed by the ICI fabric) instead of a
compiler-chosen collective, using the same issue-then-wait deep-queue
discipline as ops/pallas_gather.py.

Semantics match `jax.lax.all_to_all` on a leading device-chunk axis:
input [n, C, D] shard on device d holds chunk j destined for device j;
output [n, C, D] on device d holds chunk s received from device s (the
d-th chunk is the local pass-through).

Validated in pallas TPU *interpret* mode on the 8-virtual-device CPU
mesh (tests/test_pallas_a2a.py), which emulates the remote DMAs and the
barrier semaphore — the multi-chip path stays testable without multi-
chip hardware. On a real pod slice the same kernel compiles with
`interpret=False` and a `collective_id` for the barrier.

MESH-ORDER REQUIREMENT (round-4 advisor): the kernel addresses peers by
`jax.lax.axis_index` arithmetic with `DeviceIdType.LOGICAL`, which is
correct only when the mesh's device order matches logical device order —
i.e. a 1-D mesh built from `jax.devices()` in order (what
parallel.make_mesh constructs, and what the exchange's entry points
assert). On a permuted or multi-axis mesh the remote writes would land
on the wrong peer; map through mesh coordinates before lifting that
restriction. Selectable in production via `--shard_exchange pallas`
(parallel/exchange.py routes its request/row all-to-all legs here).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

# Central collective_id allocation (round-4 advisor: a hardcoded
# constant can collide with another concurrently compiled collective
# kernel). Each pallas_call SITE draws a distinct id at trace time;
# tracing order is identical on every device of an SPMD program, so the
# ids agree across the mesh. Mosaic requires ids < 64; wraparound would
# only collide if >63 distinct collective kernels were live in ONE
# compiled program.
_CID_COUNTER = itertools.count(1)


def alloc_collective_id() -> int:
    return next(_CID_COUNTER) % 64

def _shard_map_unchecked(f, mesh, in_specs, out_specs):
    # check_vma=False: the pallas interpret-mode machinery mixes
    # axis-varying and invariant scalars internally, which the vma
    # checker rejects (jax 0.9); correctness is asserted against
    # lax.all_to_all in tests instead.
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover — older jax
        from ..parallel.embedding_parallel import shard_map
        return shard_map(f, mesh, in_specs, out_specs)


def _a2a_kernel(n: int, axis: str, in_ref, out_ref, send_sem, recv_sem):
    my_id = jax.lax.axis_index(axis)

    # Barrier: every peer must have entered the kernel (its out_ref
    # allocated) before anyone writes into remote memory. Skipped at
    # n == 1 (no peers): Mosaic refuses to EMIT get_barrier_semaphore
    # without the barrier-sync runtime flag, and the single-device
    # compile smoke (tools/pallas_a2a_smoke.py) must stay flag-free.
    if n > 1:
        barrier = pltpu.get_barrier_semaphore()
        for k in range(1, n):
            pltpu.semaphore_signal(
                barrier, 1, device_id=(my_id + k) % n,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, n - 1)

    # local chunk: out[my_id] = in[my_id]
    out_ref[my_id] = in_ref[my_id]

    # issue all n-1 remote sends back-to-back (deep queue — same
    # discipline as pallas_gather), then wait. Sender d's chunk dst
    # lands in receiver dst's out[d]; the matching recv (chunk from
    # src = my_id - k) signals our recv_sem[k-1] with the same byte
    # count, so .wait() on the symmetric descriptor is exact.
    copies = []
    for k in range(1, n):
        dst = (my_id + k) % n
        c = pltpu.make_async_remote_copy(
            src_ref=in_ref.at[dst],
            dst_ref=out_ref.at[my_id],
            send_sem=send_sem.at[k - 1],
            recv_sem=recv_sem.at[k - 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def a2a_shard(xs: jnp.ndarray, n: int, axis: str,
              interpret: bool = False,
              collective_id: int | None = None) -> jnp.ndarray:
    """The per-shard pallas all-to-all: call INSIDE shard_map over a 1-D
    identity-ordered mesh axis (see module docstring). xs [n, ...]: chunk
    j destined for peer j; returns [n, ...] with chunk s received from
    peer s. Used by parallel.exchange's `--shard_exchange pallas` legs."""
    kernel = functools.partial(_a2a_kernel, n, axis)
    if n == 1:
        # no barrier at n=1 (see _a2a_kernel) — Mosaic then requires
        # collective_id be left unset
        cid = None
    else:
        cid = (alloc_collective_id() if collective_id is None
               else collective_id)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=cid),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(xs)


def pallas_all_to_all(x: jnp.ndarray, mesh, axis: str = "x",
                      interpret: bool = False,
                      collective_id: int | None = None) -> jnp.ndarray:
    """lax.all_to_all over `axis` via direct remote DMAs.

    x: globally [n*n, C, D] sharded P(axis) — each device holds [n, C, D],
    chunk j destined for device j. Returns the transposed layout: device
    d's chunk j replaced by the chunk received from device j.
    """
    n = mesh.shape[axis]

    def per_shard(xs):
        return a2a_shard(xs, n, axis, interpret, collective_id)

    return _shard_map_unchecked(per_shard, mesh, P(axis), P(axis))(x)
