"""Edge-partitioned graph parallelism with explicit halo exchange.

The GNN analogue of sequence/context parallelism (survey §2.4): one large
event is split across the mesh ``graph`` axis by partitioning NODES into
contiguous row blocks and assigning every edge to the device that owns its
RECEIVER.  Consequences, by construction:

  * message aggregation (segment-sum into receivers) is purely local --
    no psum;
  * the only communication is the halo: sender-side node features living on
    other devices, refreshed once per message-passing iteration via
    ``all_gather`` over the ICI ring (a targeted ppermute halo is the
    refinement once profiles show the gather bound).

Implemented with ``shard_map`` so the collective schedule is explicit
rather than left to the SPMD partitioner.  Parameters are replicated.

NOTE: the PRODUCTION graph-parallel path lives in
:mod:`parallel.graph_shard`, which runs the shipped flax models (cells,
blocks, pooled space) under this same schedule.  This module keeps the
minimal flat-IN demonstration used to validate the Pallas
bidirectional-ring RDMA collective inside a message-passing loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hierarchicalgnn_tpu.ops.segment import segment_sum


def partition_edges_by_receiver(senders, receivers, edge_mask, num_nodes,
                                n_parts):
    """Host-side partition plan: device d owns nodes [d*B, (d+1)*B) and the
    edges whose receiver falls in its block.

    Returns per-device arrays stacked on a leading axis [P, E_cap]:
    (senders_global, receivers_local, edge_mask).  ``E_cap`` is the max
    per-device edge count rounded up, so shapes are static and identical
    across devices.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask)
    if num_nodes % n_parts:
        raise ValueError(f"num_nodes {num_nodes} not divisible by {n_parts}")
    block = num_nodes // n_parts

    owner = receivers // block
    counts = [int(((owner == d) & edge_mask).sum()) for d in range(n_parts)]
    e_cap = max(max(counts), 1)
    e_cap = -(-e_cap // 128) * 128  # lane-align

    s_out = np.zeros((n_parts, e_cap), np.int32)
    r_out = np.zeros((n_parts, e_cap), np.int32)
    m_out = np.zeros((n_parts, e_cap), bool)
    for d in range(n_parts):
        sel = (owner == d) & edge_mask
        k = int(sel.sum())
        s_out[d, :k] = senders[sel]
        r_out[d, :k] = receivers[sel] - d * block
        m_out[d, :k] = True
    return s_out, r_out, m_out


def make_halo_flat_forward(model_block_apply, mesh: Mesh, axis: str = "graph",
                           rdma_gather: bool = False):
    """Wrap a flat-IN style per-shard forward into a shard_map.

    ``model_block_apply(params, x_local, senders_global, receivers_local,
    edge_mask, gather_nodes)`` is the per-device computation; it receives a
    ``gather_nodes(nodes_local) -> all_nodes`` halo function that hides the
    collective.

    ``rdma_gather``: route the halo through the hand-scheduled Pallas
    bidirectional-ring RDMA collective (ops/pallas/ring_gather.py) instead
    of ``lax.all_gather`` (interpreted off-TPU).
    """
    if rdma_gather:
        from hierarchicalgnn_tpu.ops.pallas.ring_gather import ring_all_gather

        n_dev = mesh.shape[axis]
        interp = jax.default_backend() != "tpu"

        def gather_nodes(nodes_local):
            return ring_all_gather(nodes_local, axis, n_dev, interpret=interp)
    else:
        def gather_nodes(nodes_local):
            return jax.lax.all_gather(nodes_local, axis, axis=0, tiled=True)

    def per_device(params, x_local, senders, receivers_local, edge_mask):
        return model_block_apply(params, x_local, senders, receivers_local,
                                 edge_mask, gather_nodes)

    return shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,  # the Pallas RDMA gather has no vma annotations
    )


def flat_in_reference_step(params, mlps, x, senders, receivers, edge_mask,
                           num_nodes, iterations):
    """Unsharded oracle of the halo computation for equivalence tests."""
    node_enc, edge_enc, node_net, edge_net = mlps
    nodes = node_enc.apply({"params": params["node_enc"]}, x)
    edges = edge_enc.apply({"params": params["edge_enc"]},
                           jnp.concatenate([x[senders], x[receivers]], -1))
    for _ in range(iterations):
        msgs = segment_sum(edges, receivers, num_nodes, mask=edge_mask)
        nodes = node_net.apply({"params": params["node_net"]},
                               jnp.concatenate([nodes, msgs], -1)) + nodes
        e_in = jnp.concatenate([nodes[senders], nodes[receivers], edges], -1)
        edges = edge_net.apply({"params": params["edge_net"]}, e_in) + edges
    return nodes


def make_halo_flat_in(mlps, iterations):
    """Per-device flat-IN forward with halo gathers, for
    :func:`make_halo_flat_forward`.

    x is row-sharded; edges are receiver-partitioned so the segment-sum is
    local; sender features come from the halo gather each iteration.
    """
    node_enc, edge_enc, node_net, edge_net = mlps

    def apply(params, x_local, senders, receivers_local, edge_mask,
              gather_nodes):
        n_local = x_local.shape[0]
        nodes_local = node_enc.apply({"params": params["node_enc"]}, x_local)
        x_all = gather_nodes(x_local)
        block = n_local
        idx = jax.lax.axis_index("graph")
        recv_global = receivers_local + idx * block
        edges = edge_enc.apply(
            {"params": params["edge_enc"]},
            jnp.concatenate([x_all[senders], x_all[recv_global]], -1))
        for _ in range(iterations):
            msgs = segment_sum(edges, receivers_local, n_local,
                               mask=edge_mask)
            nodes_local = node_net.apply(
                {"params": params["node_net"]},
                jnp.concatenate([nodes_local, msgs], -1)) + nodes_local
            all_nodes = gather_nodes(nodes_local)  # halo refresh
            e_in = jnp.concatenate(
                [all_nodes[senders], all_nodes[recv_global], edges], -1)
            edges = edge_net.apply({"params": params["edge_net"]}, e_in) + edges
        return nodes_local

    return apply
