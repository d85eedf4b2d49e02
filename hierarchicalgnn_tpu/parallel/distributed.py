"""Multi-host initialization and cross-host mesh construction.

The reference has no distributed support (single GPU; ``README.md:65``
flags multi-GPU as unstable).  TPU-native scale-out: each host process
calls :func:`initialize` (JAX coordination service), then builds one
global mesh spanning all hosts -- event DP rides DCN across hosts, the
``graph`` (edge-partition) axis stays within a host's ICI domain so halo
collectives never cross the slow interconnect.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize with TPU-pod auto-detection.

    On Cloud TPU pods all arguments auto-detect from the metadata server;
    pass them explicitly on other fabrics.  Safe to call once per process
    before any backend use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(graph_per_host: int = 1) -> Mesh:
    """Mesh over ALL devices: ('data', 'graph') with the graph axis bounded
    by a single host's local device count (ICI-only halo traffic)."""
    devices = np.asarray(jax.devices())
    local = jax.local_device_count()
    if graph_per_host > local or local % graph_per_host:
        raise ValueError(
            f"graph_per_host {graph_per_host} incompatible with "
            f"{local} local devices")
    data = len(devices) // graph_per_host
    return Mesh(devices.reshape(data, graph_per_host), ("data", "graph"))
