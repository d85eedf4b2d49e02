"""Message-passing cells.

TPU re-designs of ``InteractionGNNCell`` and ``HierarchicalGNNCell``
(reference ``Modules/gnn_utils.py:17-169``).  Aggregations are masked
segment reductions (Pallas-dispatchable); each update is remat-wrapped
when ``cfg.remat`` mirroring the reference's pervasive gradient
checkpointing (``Modules/gnn_utils.py:14-15``) so activation memory stays
flat across the 6-14 iteration stacks; ``remat: false`` trades HBM for a
backward pass without MLP recompute.

The hierarchical update order is semantic, not incidental: supernodes are
computed from *old* nodes, then nodes from *new* supernodes
(reference ``gnn_utils.py:162-167``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from hierarchicalgnn_tpu.ops.segment import make_aggregator
from hierarchicalgnn_tpu.models.mlp import MLP, maybe_remat
from hierarchicalgnn_tpu.utils.config import ArchConfig



class InteractionGNNCell(nn.Module):
    """One flat interaction-network iteration (reference ``gnn_utils.py:45-71``):

      m_i   = sum_{e: recv(e)=i} edge_e          (masked segment sum)
      n_i  <- MLP_n([n_i, m_i]) + n_i
      e    <- MLP_e([n_src, n_recv, e]) + e
    """

    cfg: ArchConfig

    @nn.compact
    def __call__(self, nodes, edges, graph, agg=None, gather=None):
        """``agg``: prebuilt edge->receiver aggregator (one per graph per
        forward; see ops.segment.make_aggregator).  ``gather``: endpoint
        gather ``nodes -> (nodes[s], nodes[r])`` with kernel-backed
        backward (sorted mode).  Both built ad hoc if None."""
        node_network = maybe_remat(MLP, self.cfg)(
            hidden_size=self.cfg.hidden, output_size=self.cfg.latent,
            hidden_layers=self.cfg.nb_node_layer, layer_norm=self.cfg.layernorm,
            output_activation=self.cfg.hidden_activation,
            hidden_activation=self.cfg.hidden_activation,
            compute_dtype=self.cfg.compute_dtype)
        edge_network = maybe_remat(MLP, self.cfg)(
            hidden_size=self.cfg.hidden, output_size=self.cfg.latent,
            hidden_layers=self.cfg.nb_edge_layer, layer_norm=self.cfg.layernorm,
            output_activation="Tanh",
            hidden_activation=self.cfg.hidden_activation,
            compute_dtype=self.cfg.compute_dtype)

        n = nodes.shape[0]
        if agg is None:
            agg = make_aggregator(graph.receivers, graph.edge_mask, n)
        if gather is None:
            gather = lambda x: (x[graph.senders], x[graph.receivers])
        # Aggregators accumulate in f32; cast messages back to the residual
        # stream's dtype so a bf16 data path stays bf16 through the concat.
        edge_messages = agg(edges).astype(nodes.dtype)
        nodes = node_network(jnp.concatenate([nodes, edge_messages], -1)) + nodes

        n_src, n_dst = gather(nodes)
        edges = edge_network(jnp.concatenate([n_src, n_dst, edges], -1)) + edges
        return nodes, edges


class HierarchicalGNNCell(nn.Module):
    """One hierarchical iteration (reference ``gnn_utils.py:119-169``).

    Bipartite (hit<->supernode) messages are weighted graph convolutions:
    per-edge weights from DynamicGraphConstruction multiply gathered
    features before the segment sum; super-graph messages are weighted
    superedge aggregations.
    """

    cfg: ArchConfig

    @nn.compact
    def __call__(self, nodes, edges, supernodes, superedges,
                 graph, bipartite, super_graph, aggs=None, gathers=None):
        """bipartite/super_graph: (Graph, weights[E,1]) tuples.

        ``aggs``: dict of prebuilt aggregators {edge_to_node, bip_to_super,
        bip_to_node, super_to_super} shared across iterations.  The
        bipartite and supergraph entries are *weighted* aggregators: the
        per-edge convolution weight is applied inside (fused into the
        one-hot MXU matmul in sorted-native mode, so the weighting costs no
        extra HBM pass)."""
        cfg = self.cfg
        node_network = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_node_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        edge_network = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_edge_layer, layer_norm=cfg.layernorm,
            output_activation="Tanh", hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        supernode_network = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_node_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        superedge_network = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_edge_layer, layer_norm=cfg.layernorm,
            output_activation="Tanh", hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)

        bgraph, bweights = bipartite
        sgraph, sweights = super_graph
        n_nodes = nodes.shape[0]
        n_super = supernodes.shape[0]
        if aggs is None:
            def weighted(aggfn, w):
                return lambda d: aggfn(d * w)

            aggs = {
                "edge_to_node": make_aggregator(
                    graph.receivers, graph.edge_mask, n_nodes),
                "bip_to_super": (weighted(make_aggregator(
                    bgraph.receivers, bgraph.edge_mask, n_super), bweights),
                    bgraph.senders),
                "bip_to_node": (weighted(make_aggregator(
                    bgraph.senders, bgraph.edge_mask, n_nodes), bweights),
                    bgraph.receivers),
                "super_to_super": weighted(make_aggregator(
                    sgraph.receivers, sgraph.edge_mask, n_super), sweights),
            }
        # The bipartite aggregators carry their own edge-order arrays: in
        # sorted-native (Pallas) mode each direction uses its own
        # receiver-sorted copy of the bipartite edge list + weights.
        if gathers is None:
            gathers = {
                "graph": lambda x: (x[graph.senders], x[graph.receivers]),
                "super": lambda x: (x[sgraph.senders], x[sgraph.receivers]),
            }
        agg_to_super, b_send = aggs["bip_to_super"]
        agg_to_node, b_cluster = aggs["bip_to_node"]
        # Pooled-space partition (parallel/graph_shard.py): supernode rows
        # are row-blocked and ``super_bcast`` rebuilds the replicated array
        # (one all_gather) for the supernode->node direction and the
        # superedge endpoint gathers; identity when the pooled space is
        # replicated/unsharded.
        super_bcast = gathers.get("super_bcast", lambda x: x)

        # --- supernode update from OLD nodes (reference :138-145) ---
        # (f32-accumulated messages cast back to the residual dtype)
        node_messages = agg_to_super(nodes[b_send]).astype(supernodes.dtype)
        attention_messages = aggs["super_to_super"](
            superedges).astype(supernodes.dtype)
        new_supernodes = supernode_network(jnp.concatenate(
            [supernodes, attention_messages, node_messages], -1)) + supernodes
        sn_all = super_bcast(new_supernodes)

        # --- node update from NEW supernodes (reference :119-127) ---
        supernode_messages = agg_to_node(
            sn_all[b_cluster]).astype(nodes.dtype)
        edge_messages = aggs["edge_to_node"](edges).astype(nodes.dtype)
        new_nodes = node_network(jnp.concatenate(
            [nodes, edge_messages, supernode_messages], -1)) + nodes

        # --- superedge / edge updates (reference :147-153, :129-135) ---
        sn_src, sn_dst = gathers["super"](sn_all)
        new_superedges = superedge_network(jnp.concatenate(
            [sn_src, sn_dst, superedges], -1)) + superedges
        nn_src, nn_dst = gathers["graph"](new_nodes)
        new_edges = edge_network(jnp.concatenate(
            [nn_src, nn_dst, edges], -1)) + edges

        return new_nodes, new_edges, new_supernodes, new_superedges
