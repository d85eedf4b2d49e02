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


# ---------------------------------------------------------------------------
# Hierarchical cell under edge partitioning.
#
# The hierarchical iteration has 4-way traffic (survey hard part: node <->
# supernode crossings both ways).  Design: nodes row-partitioned as in the
# flat case; supernodes REPLICATED (there are <= max_clusters of them, tiny
# next to the node space).  Consequences per iteration:
#
#   * bip node->super aggregation: each device segment-sums its local nodes'
#     weighted features into the full supernode space, then one psum([C, D])
#     completes it -- the only supernode-direction collective;
#   * supernode + superedge updates: computed replicated on every device
#     (psum makes the inputs identical, so the outputs stay identical);
#   * bip super->node aggregation: supernodes are replicated, so the
#     weighted gather + segment-sum into local nodes is purely local;
#   * edge update: sender features via the same all_gather halo as the
#     flat stack.
# ---------------------------------------------------------------------------


def partition_bipartite_by_node(b_nodes, b_supers, edge_mask, weights,
                                num_nodes, n_parts):
    """Host-side plan: device d owns bipartite edges whose NODE endpoint
    falls in its row block.  Node indices are localized; supernode indices
    stay global (supernodes are replicated).

    Returns [P, E_cap] arrays (nodes_local, supers_global, mask, weights).
    """
    b_nodes = np.asarray(b_nodes)
    b_supers = np.asarray(b_supers)
    edge_mask = np.asarray(edge_mask)
    weights = np.asarray(weights).reshape(-1)
    if num_nodes % n_parts:
        raise ValueError(f"num_nodes {num_nodes} not divisible by {n_parts}")
    block = num_nodes // n_parts

    owner = b_nodes // block
    counts = [int(((owner == d) & edge_mask).sum()) for d in range(n_parts)]
    e_cap = -(-max(max(counts), 1) // 128) * 128

    n_out = np.zeros((n_parts, e_cap), np.int32)
    s_out = np.zeros((n_parts, e_cap), np.int32)
    m_out = np.zeros((n_parts, e_cap), bool)
    w_out = np.zeros((n_parts, e_cap), np.float32)
    for d in range(n_parts):
        sel = (owner == d) & edge_mask
        k = int(sel.sum())
        n_out[d, :k] = b_nodes[sel] - d * block
        s_out[d, :k] = b_supers[sel]
        m_out[d, :k] = True
        w_out[d, :k] = weights[sel]
    return n_out, s_out, m_out, w_out


def hierarchical_reference_step(params, mlps, nodes, edges, supernodes,
                                superedges, graph, bipartite, super_graph,
                                iterations):
    """Unsharded oracle of the partitioned hierarchical iteration.

    ``graph`` = (senders, receivers, edge_mask); ``bipartite`` =
    (b_nodes, b_supers, b_mask, b_weights[E]); ``super_graph`` =
    (s_senders, s_receivers, s_mask, s_weights[E]).  Update order matches
    HierarchicalGNNCell (supernodes from old nodes, nodes from new
    supernodes; reference gnn_utils.py:162-167).
    """
    node_net, edge_net, super_net, superedge_net = mlps
    senders, receivers, edge_mask = graph
    b_nodes, b_supers, b_mask, b_w = bipartite
    s_s, s_r, s_mask, s_w = super_graph
    n = nodes.shape[0]
    c = supernodes.shape[0]
    b_w = jnp.where(b_mask, b_w, 0.0)[:, None]
    s_w = jnp.where(s_mask, s_w, 0.0)[:, None]

    for _ in range(iterations):
        node_msgs = segment_sum(nodes[b_nodes] * b_w, b_supers, c)
        att_msgs = segment_sum(superedges * s_w, s_r, c, mask=s_mask)
        new_supernodes = super_net.apply(
            {"params": params["super_net"]},
            jnp.concatenate([supernodes, att_msgs, node_msgs], -1)
        ) + supernodes

        super_msgs = segment_sum(new_supernodes[b_supers] * b_w, b_nodes, n)
        edge_msgs = segment_sum(edges, receivers, n, mask=edge_mask)
        new_nodes = node_net.apply(
            {"params": params["node_net"]},
            jnp.concatenate([nodes, edge_msgs, super_msgs], -1)) + nodes

        new_superedges = superedge_net.apply(
            {"params": params["superedge_net"]},
            jnp.concatenate([new_supernodes[s_s], new_supernodes[s_r],
                             superedges], -1)) + superedges
        new_edges = edge_net.apply(
            {"params": params["edge_net"]},
            jnp.concatenate([new_nodes[senders], new_nodes[receivers],
                             edges], -1)) + edges
        nodes, edges = new_nodes, new_edges
        supernodes, superedges = new_supernodes, new_superedges
    return nodes, supernodes


def make_halo_hierarchical(mlps, iterations, axis: str = "graph"):
    """Per-device hierarchical iteration stack for shard_map.

    Sharded inputs (leading dim over ``axis``): nodes_local, main-graph
    edge features + (senders_global, receivers_local, edge_mask), bipartite
    (b_nodes_local, b_supers_global, b_mask, b_weights).  Replicated:
    supernodes, superedges, supergraph structure + weights.
    """
    node_net, edge_net, super_net, superedge_net = mlps

    def apply(params, nodes_local, edges, senders, receivers_local,
              edge_mask, bn_local, bs_global, b_mask, b_w,
              s_s, s_r, s_mask, s_w, supernodes, superedges):
        n_local = nodes_local.shape[0]
        c = supernodes.shape[0]
        idx = jax.lax.axis_index(axis)
        bw = jnp.where(b_mask, b_w, 0.0)[:, None]
        sw = jnp.where(s_mask, s_w, 0.0)[:, None]

        for _ in range(iterations):
            # --- supernode update from OLD nodes: local partial + psum ---
            partial = segment_sum(nodes_local[bn_local] * bw, bs_global, c)
            node_msgs = jax.lax.psum(partial, axis)
            att_msgs = segment_sum(superedges * sw, s_r, c, mask=s_mask)
            new_supernodes = super_net.apply(
                {"params": params["super_net"]},
                jnp.concatenate([supernodes, att_msgs, node_msgs], -1)
            ) + supernodes

            # --- node update from NEW supernodes: purely local ---
            super_msgs = segment_sum(
                new_supernodes[bs_global] * bw, bn_local, n_local)
            edge_msgs = segment_sum(edges, receivers_local, n_local,
                                    mask=edge_mask)
            new_nodes = node_net.apply(
                {"params": params["node_net"]},
                jnp.concatenate([nodes_local, edge_msgs, super_msgs], -1)
            ) + nodes_local

            # --- superedge update: replicated compute ---
            new_superedges = superedge_net.apply(
                {"params": params["superedge_net"]},
                jnp.concatenate([new_supernodes[s_s], new_supernodes[s_r],
                                 superedges], -1)) + superedges

            # --- edge update: all_gather halo for endpoint features ---
            all_nodes = jax.lax.all_gather(new_nodes, axis, axis=0,
                                           tiled=True)
            recv_global = receivers_local + idx * n_local
            new_edges = edge_net.apply(
                {"params": params["edge_net"]},
                jnp.concatenate([all_nodes[senders], all_nodes[recv_global],
                                 edges], -1)) + edges

            nodes_local, edges = new_nodes, new_edges
            supernodes, superedges = new_supernodes, new_superedges
        return nodes_local, supernodes

    return apply


def make_halo_hierarchical_forward(per_device, mesh: Mesh,
                                   axis: str = "graph"):
    """shard_map wrapper for :func:`make_halo_hierarchical`.

    Per-device bipartite/edge arrays are passed as flattened [P*E_cap]
    stacks sharded over ``axis``; supernode-space inputs are replicated.
    The supernode output is identical on every device (psum-derived), so it
    is returned replicated.
    """
    sharded = P(axis)
    rep = P()
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(rep,                      # params
                  sharded, sharded,         # nodes_local, edges
                  sharded, sharded, sharded,  # senders, recv_local, mask
                  sharded, sharded, sharded, sharded,  # bipartite
                  rep, rep, rep, rep,       # supergraph
                  rep, rep),                # supernodes, superedges
        out_specs=(sharded, rep),
        check_vma=False,
    )
