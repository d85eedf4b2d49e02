"""Device mesh helpers.

The reference is single-GPU only (``Trainer(gpus=1)``, reference
``Notebooks/script.py:35``; multi-GPU explicitly flagged unstable in
``README.md:65``).  Scaling here is TPU-native: a ``jax.sharding.Mesh``
with a ``data`` axis (event-level data parallelism -- events are
independent, batch_size=1 in the reference) and a ``graph`` axis
(edge-partitioned parallelism within an event, the GNN analogue of
sequence/context parallelism).  XLA's SPMD partitioner inserts the
psum/all-gather collectives implied by the shardings.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hierarchicalgnn_tpu.data.event import Event


def make_mesh(data: int = 1, graph: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * graph
    if n > len(devices):
        raise ValueError(f"mesh {data}x{graph} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, graph)
    return Mesh(dev, ("data", "graph"))


def batch_sharding(mesh: Mesh) -> Event:
    """PartitionSpec pytree for a batched Event [B, ...].

    Node-indexed arrays shard over the data axis only (replicated across
    the graph axis so segment reductions stay local + psum); edge-indexed
    arrays additionally shard their edge axis over the graph axis.
    """
    node = NamedSharding(mesh, P("data"))
    edge = NamedSharding(mesh, P("data", "graph"))
    scalar = NamedSharding(mesh, P("data"))

    def egraph():
        from hierarchicalgnn_tpu.ops.graph import Graph
        return Graph(senders=edge, receivers=edge, edge_mask=edge)

    return Event(
        x=node, pt=node, pid=node, primary=node, nhits=node,
        signal_mask=node, node_mask=node,
        graph=egraph(), y=edge, y_pid=edge,
        true_graph=egraph(), signal_true_graph=egraph(),
        inverse_mask=node,
        pid_compact=node, n_particles=scalar,
        particle_pid=node, particle_pt=node, particle_nhits=node,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
