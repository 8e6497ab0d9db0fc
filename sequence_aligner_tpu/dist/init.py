"""Multi-host distributed initialization and mesh construction.

The reference is a single-JVM program with no multi-node story
(SURVEY.md section 2.6); this layer is net-new by design: the TPU-native
framework scales across hosts with ``jax.distributed`` — each host runs
one process, the mesh spans every chip of every process, ICI carries
in-slice collectives and DCN carries cross-host ones.  The same code
path runs a CPU simulation (N processes x M virtual devices) for tests
on machines without multi-host TPU.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    *,
    local_device_count: int | None = None,
) -> None:
    """Join the jax.distributed cluster.

    On TPU pods the three arguments are inferred from the environment;
    pass them explicitly for CPU simulations or manual clusters.
    ``local_device_count`` forces N virtual CPU devices per process
    (must be set before any jax backend initialization).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{local_device_count}"
            ).strip()
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def distributed_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over every device of every process, in process-major
    order (devices of process 0 first) so contiguous row-blocks of a
    sharded array land on their owning process."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))
