"""The four pipeline models.

Each is a flax module over (x, undirected Graph, node_mask); forwards
mirror the reference model forwards but on padded static shapes:

  * EdgeClassifierIN        -- reference ``Modules/EdgeClassifier/Models/IN.py:97-128``
  * EmbeddingIN             -- reference ``Modules/GNNEmbedding/Models/IN.py:99-118``
  * EmbeddingHGNNGMM        -- reference ``Modules/GNNEmbedding/Models/HGNN_GMM.py:278-301``
  * BipartiteClassifierHGNN -- reference ``Modules/BipartiteClassification/Models/HGNN_GMM.py:300-346``
  * GMRT                    -- reference ``Modules/gMRT/Models/HGNM_GMM.py:276-356``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hierarchicalgnn_tpu.ops.graph import Graph, bidirectionalize
from hierarchicalgnn_tpu.models.blocks import (
    GMRTEncoders, HierarchicalGNNBlock, InteractionGNNBlock,
    sorted_graph_mode,
)


def _work_graph(cfg, directed, num_nodes):
    """Receiver-sorted work graph + shared aggregator/gather in Pallas mode."""
    if cfg.use_pallas:
        return sorted_graph_mode(directed, num_nodes)
    return directed, None, None, None


def _shard_tools(cfg, directed, n_local, spmd):
    """Per-device partition/halo handles for the graph-parallel forward
    (parallel/graph_shard.py); the Pallas toggle follows the model config."""
    from hierarchicalgnn_tpu.parallel.graph_shard import make_shard_tools

    return make_shard_tools(directed, n_local,
                            spmd._replace(use_pallas=cfg.use_pallas))
from hierarchicalgnn_tpu.models.mlp import MLP, maybe_remat
from hierarchicalgnn_tpu.utils.config import ArchConfig


class EdgeClassifierIN(nn.Module):
    """Flat interaction-network edge classifier (EC-IN).

    Scores each undirected edge from the concat of its two directed copies'
    edge features (reference ``IN.py:118-128``).
    """

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False,
                 spmd=None):
        """``spmd``: a ``parallel.graph_shard.SpmdSpec`` when running inside
        shard_map with x/node_mask as local node-row blocks; the returned
        scores are this device's contiguous slice of the undirected edge
        space (shard_map reassembles the global array)."""
        cfg = self.cfg
        e = graph.capacity
        directed = bidirectionalize(graph)
        if spmd is None:
            work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
            nodes, edges = InteractionGNNBlock(
                cfg, cfg.n_interaction_graph_iters, emb=False)(
                    x, work, agg=agg, gather=gather)
            if plan is not None:
                edges = plan.unsort(edges)  # pair directed copies in input order
        else:
            tools = _shard_tools(cfg, directed, x.shape[0], spmd)
            nodes, edges_local = InteractionGNNBlock(
                cfg, cfg.n_interaction_graph_iters, emb=False)(
                    x, tools.local_graph, agg=tools.agg, gather=tools.gather,
                    encode_gather=tools.gather)
        edge_classifier = MLP(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        if spmd is None:
            scores = edge_classifier(
                jnp.concatenate([edges[:e], edges[e:]], -1))[:, 0]
            scores = scores.astype(jnp.float32)  # head leaves the bf16 path
            return jnp.where(graph.edge_mask, nn.sigmoid(scores), 0.0)
        # Paired-edge head over this device's slice of the undirected edge
        # space: the two directed copies of an edge live on (possibly)
        # different devices, so edge features are re-gathered by their
        # partition slots first.
        edges_all = tools.all_gather(edges_local)
        e_loc = e // spmd.n_parts
        off = tools.index * e_loc
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, off, e_loc, 0)
        pair = jnp.concatenate(
            [edges_all[sl(tools.slot[:e])], edges_all[sl(tools.slot[e:])]], -1)
        scores = edge_classifier(pair)[:, 0].astype(jnp.float32)
        return jnp.where(sl(graph.edge_mask), nn.sigmoid(scores), 0.0)


class EmbeddingIN(nn.Module):
    """Flat metric-learning embedding model (Embedding-IN)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False,
                 spmd=None):
        directed = bidirectionalize(graph)
        if spmd is not None:
            tools = _shard_tools(self.cfg, directed, x.shape[0], spmd)
            embeddings, _, _ = InteractionGNNBlock(
                self.cfg, self.cfg.n_interaction_graph_iters, emb=True)(
                    x, tools.local_graph, agg=tools.agg, gather=tools.gather,
                    encode_gather=tools.gather)
            return embeddings  # local rows; global after shard_map reassembly
        work, agg, gather, _ = _work_graph(self.cfg, directed, x.shape[0])
        embeddings, _, _ = InteractionGNNBlock(
            self.cfg, self.cfg.n_interaction_graph_iters, emb=True)(
                x, work, agg=agg, gather=gather)
        return embeddings


class EmbeddingHGNNGMM(nn.Module):
    """Hierarchical embedding model (Embedding-HGNN-GMM)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False,
                 spmd=None):
        directed = bidirectionalize(graph)
        if spmd is not None:
            tools = _shard_tools(self.cfg, directed, x.shape[0], spmd)
            intermediate, nodes, edges = InteractionGNNBlock(
                self.cfg, self.cfg.n_interaction_graph_iters, emb=True)(
                    x, tools.local_graph, agg=tools.agg, gather=tools.gather,
                    encode_gather=tools.gather)
            embeddings, aux = HierarchicalGNNBlock(
                self.cfg, l1_norm_supernode_init=False, emb_output=True)(
                    intermediate, nodes, edges, tools.local_graph,
                    node_mask=node_mask, training=training, shard=tools)
            return embeddings, intermediate, aux
        work, agg, gather, plan = _work_graph(self.cfg, directed, x.shape[0])
        intermediate, nodes, edges = InteractionGNNBlock(
            self.cfg, self.cfg.n_interaction_graph_iters, emb=True)(
                x, work, agg=agg, gather=gather)
        embeddings, aux = HierarchicalGNNBlock(
            self.cfg, l1_norm_supernode_init=False, emb_output=True)(
                intermediate, nodes, edges, work,
                node_mask=node_mask, training=training, agg=agg, gather=gather, plan=plan)
        return embeddings, intermediate, aux


class BipartiteClassifierHGNN(nn.Module):
    """Hierarchical bipartite hit<->supernode classifier (BC-HGNN-GMM)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False,
                 spmd=None):
        """``spmd``: graph-partitioned execution (parallel/graph_shard.py);
        x/node_mask are then local node-row blocks, the returned scores are
        this device's contiguous bipartite-edge block (global after
        shard_map reassembly), and ``bgraph``/``aux`` are replicated."""
        cfg = self.cfg
        directed = bidirectionalize(graph)
        if spmd is None:
            work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
            intermediate, nodes, edges = InteractionGNNBlock(
                cfg, cfg.n_interaction_graph_iters, emb=True)(
                    x, work, agg=agg, gather=gather)
            nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
                cfg, l1_norm_supernode_init=True, emb_output=False)(
                    intermediate, nodes, edges, work,
                    node_mask=node_mask, training=training, agg=agg,
                    gather=gather, plan=plan)
        else:
            tools = _shard_tools(cfg, directed, x.shape[0], spmd)
            intermediate, nodes, edges = InteractionGNNBlock(
                cfg, cfg.n_interaction_graph_iters, emb=True)(
                    x, tools.local_graph, agg=tools.agg, gather=tools.gather,
                    encode_gather=tools.gather)
            nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
                cfg, l1_norm_supernode_init=True, emb_output=False)(
                    intermediate, nodes, edges, tools.local_graph,
                    node_mask=node_mask, training=training, shard=tools)

        bipartite_output_layer = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        if spmd is None:
            b_send, b_recv, b_mask = (bgraph.senders, bgraph.receivers,
                                      bgraph.edge_mask)
        else:
            from hierarchicalgnn_tpu.parallel.graph_shard import (
                bipartite_local_slice, pooled_active)

            if pooled_active(tools.spec, cfg.max_clusters):
                # pooled partition: the block's bipartite graph IS this
                # device's sender-contiguous local slice (supernodes came
                # back broadcast).  Globalize senders for the returned
                # graph -- shard_map reassembles the blocks into exactly
                # the unsharded global bipartite edge order.
                b_send, b_recv, b_mask = (bgraph.senders, bgraph.receivers,
                                          bgraph.edge_mask)
                bgraph = Graph(b_send + tools.index * tools.n_local,
                               b_recv, b_mask)
            else:
                b_send, b_recv, b_mask, _ = bipartite_local_slice(
                    tools, bgraph, bweights, cfg.bipartitegraph_sparsity)
        scores = nn.sigmoid(bipartite_output_layer(jnp.concatenate(
            [nodes[b_send], supernodes[b_recv]],
            -1))[:, 0].astype(jnp.float32))
        scores = jnp.where(b_mask, scores, 0.0)
        return bgraph, scores, intermediate, aux


class GMRT(nn.Module):
    """gMRT: BC with single-layer encoders instead of the IN stack."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False,
                 spmd=None):
        cfg = self.cfg
        directed = bidirectionalize(graph)
        if spmd is None:
            work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
            embeddings, nodes, edges = GMRTEncoders(cfg)(x, work)
            nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
                cfg, l1_norm_supernode_init=True, emb_output=False)(
                    embeddings, nodes, edges, work,
                    node_mask=node_mask, training=training, agg=agg,
                    gather=gather, plan=plan)
        else:
            tools = _shard_tools(cfg, directed, x.shape[0], spmd)
            embeddings, nodes, edges = GMRTEncoders(cfg)(
                x, tools.local_graph, encode_gather=tools.gather)
            nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
                cfg, l1_norm_supernode_init=True, emb_output=False)(
                    embeddings, nodes, edges, tools.local_graph,
                    node_mask=node_mask, training=training, shard=tools)

        bipartite_output_layer = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        if spmd is None:
            b_send, b_recv, b_mask = (bgraph.senders, bgraph.receivers,
                                      bgraph.edge_mask)
        else:
            from hierarchicalgnn_tpu.parallel.graph_shard import (
                bipartite_local_slice, pooled_active)

            if pooled_active(tools.spec, cfg.max_clusters):
                # pooled partition: the block's bipartite graph IS this
                # device's sender-contiguous local slice (supernodes came
                # back broadcast).  Globalize senders for the returned
                # graph -- shard_map reassembles the blocks into exactly
                # the unsharded global bipartite edge order.
                b_send, b_recv, b_mask = (bgraph.senders, bgraph.receivers,
                                          bgraph.edge_mask)
                bgraph = Graph(b_send + tools.index * tools.n_local,
                               b_recv, b_mask)
            else:
                b_send, b_recv, b_mask, _ = bipartite_local_slice(
                    tools, bgraph, bweights, cfg.bipartitegraph_sparsity)
        scores = nn.sigmoid(bipartite_output_layer(jnp.concatenate(
            [nodes[b_send], supernodes[b_recv]],
            -1))[:, 0].astype(jnp.float32))
        scores = jnp.where(b_mask, scores, 0.0)
        return bgraph, scores, embeddings, aux
