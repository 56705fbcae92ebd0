"""Device mesh construction.

One mesh axis, "data", serves double duty (standard DLRM hybrid parallel):
dense towers are data-parallel over it while embedding tables + sketch
buckets are row-sharded (model-parallel) over the same devices. The
reference has no distributed execution at all (SURVEY.md §2.6); this is new
design targeting TPU pod slices — ICI-adjacent devices first.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed(cfg) -> bool:
    """Join the multi-process (multi-host) runtime when configured.

    Must run before any JAX backend use. Every process then sees the
    GLOBAL device list (jax.devices()), ordered by process, so a
    make_mesh() over it spans the pod; collectives ride ICI within a host
    slice and DCN across (placement is the runtime's job — the program is
    identical either way). Reference: none (SURVEY.md §2.6)."""
    n = int(getattr(cfg, "dist_num_processes", 1) or 1)
    if n <= 1:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=cfg.dist_coordinator or "localhost:12321",
        num_processes=n,
        process_id=int(cfg.dist_process_id),
    )
    return True


def make_mesh(n_devices: Optional[int] = None, inner: int = 0) -> Mesh:
    """Flat ("data",) mesh, or — when inner > 0 — a TWO-LEVEL
    ("dcn", "ici") mesh of shape (n_devices // inner, inner): the inner
    axis groups ICI-adjacent chips (jax.devices() orders by process, so
    consecutive devices share a host/slice), the outer axis crosses DCN.
    The explicit exchange combines/dedups over "ici" before anything
    crosses "dcn" (exchange.sharded_fetch/apply; SURVEY.md §2.6 "DCN
    only crossing")."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available")
        devs = devs[:n_devices]
        if jax.process_count() > 1 and n_devices < len(jax.devices()):
            # a device-subset mesh under multi-process execution would
            # exclude some of a process's local devices, after which
            # make_array_from_process_local_data fails opaquely — reject
            # up front with the fix spelled out. Every process's local
            # devices must be FULLY covered (partial coverage breaks the
            # per-process row split just as badly as exclusion).
            chosen = {id(d) for d in devs}
            partial = sorted({d.process_index for d in jax.devices()
                              if id(d) not in chosen})
            if partial:
                raise ValueError(
                    f"mesh_shape {n_devices} omits local devices of "
                    f"process(es) {partial}; under multi-process "
                    f"execution the mesh must include every process's "
                    f"local devices in full (use the full "
                    f"{len(jax.devices())}-device mesh or launch fewer "
                    f"processes)")
    if inner:
        if len(devs) % inner:
            raise ValueError(
                f"mesh_inner {inner} does not divide {len(devs)} devices")
        grid = np.asarray(devs).reshape(len(devs) // inner, inner)
        return Mesh(grid, axis_names=("dcn", "ici"))
    return Mesh(np.asarray(devs), axis_names=("data",))
