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
from jax.sharding import Mesh, NamedSharding, PartitionSpec


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


def globalize_batch(local_batch, shardings):
    """Assemble a global batched Event from per-process local event stacks.

    Each process passes the [B_local, ...] stack of the events it loaded
    (host-local data never leaves the host); the returned pytree is the
    global [B_global, ...] array sharded per ``shardings`` (a matching
    pytree, e.g. ``parallel.mesh.batch_sharding(mesh)``).
    """
    def put(x, s):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree.map(put, local_batch, shardings)


def assert_host_identical(tree, name: str = "tree"):
    """Debug guard: verify every process holds bit-identical leaf values.

    ``replicate`` trusts the caller (deterministic seeded init); a seed or
    config drift between hosts would otherwise produce silently divergent
    'replicated' params.  Gathers an 8-byte sha256 fingerprint per process
    and compares — cheap enough for test/debug paths, one DCN round-trip.
    """
    import hashlib

    from jax.experimental import multihost_utils

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    # two int32 words (not one int64): jax canonicalizes int64 arrays to
    # int32 when x64 is off, which would silently truncate the fingerprint
    digest = np.frombuffer(h.digest()[:8], dtype=np.int32)
    gathered = np.asarray(
        multihost_utils.process_allgather(digest)).reshape(-1, digest.size)
    if not (gathered == digest[None]).all():
        raise ValueError(
            f"{name} differs across processes: fingerprints "
            f"{gathered.tolist()} (process {jax.process_index()} has "
            f"{digest.tolist()}) — check seeds/configs are identical")


def replicate(tree, mesh: Mesh, check: bool = False):
    """Replicate a host-identical pytree (params/opt state) onto every
    device of the global mesh.  All processes must hold equal values --
    guaranteed here by deterministic seeded init; pass ``check=True`` in
    test/debug paths to verify via :func:`assert_host_identical`."""
    if check:
        assert_host_identical(tree, "replicate() input")
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), sharding), tree)


def read_replicated(x) -> np.ndarray:
    """Host value of a (possibly non-fully-addressable) replicated array."""
    return np.asarray(x.addressable_data(0))
