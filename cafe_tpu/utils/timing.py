"""Honest device timing.

The reference brackets every ms/it window with `torch.cuda.synchronize`
(ArtifactEvaluation/main.py:385-391) so the clock measures device
execution. The JAX analogue everyone reaches for, `jax.block_until_ready`,
is NOT a reliable fence on every runtime: on the axon TPU tunnel it has
been observed (round-2 verdict; reproducible some sessions) to return
without awaiting queued dispatches, so a timing loop that enqueues N async
dispatches and then blocks on the last result can read the host's RPC
enqueue rate — three orders of magnitude off — instead of the chip.

The only sync a remote runtime cannot fake is a VALUE FETCH: to hand the
host real bytes of a result, the device must have executed everything the
result depends on. `fence()` therefore builds (under jit) a scalar
checksum that depends on the first element of EVERY array leaf passed in
and fetches it to the host. End every timed window with
`fence(last_output)` where `last_output` transitively depends on all
timed work (e.g. the final TrainState + metrics of a step chain).

Validation: tools/clock_probe.py times a known-FLOPs matmul chain both
ways; a clock is honest iff it never reports more than the chip's peak.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _checksum(leaves):
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        first = leaf[(0,) * leaf.ndim] if leaf.ndim else leaf
        # isfinite-guard: a NaN/inf leaf must not poison the fence into
        # something XLA could constant-fold; convert then zero non-finite
        v = first.astype(jnp.float32)
        acc = acc + jnp.where(jnp.isfinite(v), v, jnp.float32(0))
    return acc


def fence(*trees) -> float:
    """Force-materialize a host value depending on every array leaf.

    Returns the (meaningless) checksum so callers can keep a data
    dependence alive. Safe on any pytree mix: non-array leaves are
    ignored; bool/int/bf16 leaves are converted; sharded global arrays
    are fenced via their process-local shard.
    """
    leaves = [x for x in jax.tree.leaves(trees)
              if isinstance(x, jax.Array) and x.size > 0]
    if not leaves:
        return 0.0
    out = _checksum(leaves)
    if getattr(out, "is_fully_addressable", True):
        return float(np.asarray(out))
    return float(np.asarray(out.addressable_data(0)))


def queue_bound() -> int:
    """Max async dispatches to leave in flight between fences for SHARDED
    programs. The CPU backend's in-process collectives LIVELOCK when the
    queue of dispatched collective programs grows: device threads share
    the host's cores, and with ~64+ queued 8-device programs (measured;
    onset between 16 and 64 on a 1-core host) some participant never
    reaches the rendezvous and the 40s watchdog aborts the process.
    16 is safely under onset. Real TPU queues need bounding only as
    memory backpressure — 256 keeps the fence cost negligible
    (~7 value fetches per 1000 dispatches through the tunnel)."""
    import jax
    return 16 if jax.default_backend() == "cpu" else 256


def timed_window(run_once, steps: int) -> float:
    """Time `steps` calls of `run_once` (which must return the call's
    output tree), fencing on the LAST output. Returns seconds."""
    t0 = time.time()
    out = None
    for _ in range(steps):
        out = run_once()
    fence(out)
    return time.time() - t0
