"""Device mesh helpers.

The overlap engine's distributed axes (SURVEY.md section 2.5/2.6):
  - ``shard``: the single partition axis of v1 — reads are data-parallel
    over it, the k-mer table is hash-prefix sharded across it, and pair
    aggregation is pair-key sharded across it.  On a multi-host pod slice
    the same axis spans hosts (ICI within a slice, DCN across).

A richer 2-D (host, chip) factorization can be layered on later without
changing the step function — the collectives only name the axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set --xla_force_host_platform_device_count for CPU tests)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
