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


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))
