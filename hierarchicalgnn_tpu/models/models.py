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
from hierarchicalgnn_tpu.models.mlp import MLP, maybe_remat
from hierarchicalgnn_tpu.utils.config import ArchConfig


class EdgeClassifierIN(nn.Module):
    """Flat interaction-network edge classifier (EC-IN).

    Scores each undirected edge from the concat of its two directed copies'
    edge features (reference ``IN.py:118-128``).
    """

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False):
        cfg = self.cfg
        e = graph.capacity
        directed = bidirectionalize(graph)
        work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
        nodes, edges = InteractionGNNBlock(
            cfg, cfg.n_interaction_graph_iters, emb=False)(x, work, agg=agg, gather=gather)
        if plan is not None:
            edges = plan.unsort(edges)  # pair directed copies in input order
        edge_classifier = MLP(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        scores = edge_classifier(
            jnp.concatenate([edges[:e], edges[e:]], -1))[:, 0]
        scores = scores.astype(jnp.float32)  # head output leaves the bf16 path
        return jnp.where(graph.edge_mask, nn.sigmoid(scores), 0.0)


class EmbeddingIN(nn.Module):
    """Flat metric-learning embedding model (Embedding-IN)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False):
        directed = bidirectionalize(graph)
        work, agg, gather, _ = _work_graph(self.cfg, directed, x.shape[0])
        embeddings, _, _ = InteractionGNNBlock(
            self.cfg, self.cfg.n_interaction_graph_iters, emb=True)(
                x, work, agg=agg, gather=gather)
        return embeddings


class EmbeddingHGNNGMM(nn.Module):
    """Hierarchical embedding model (Embedding-HGNN-GMM)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False):
        directed = bidirectionalize(graph)
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
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False):
        cfg = self.cfg
        directed = bidirectionalize(graph)
        work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
        intermediate, nodes, edges = InteractionGNNBlock(
            cfg, cfg.n_interaction_graph_iters, emb=True)(x, work, agg=agg, gather=gather)
        nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
            cfg, l1_norm_supernode_init=True, emb_output=False)(
                intermediate, nodes, edges, work,
                node_mask=node_mask, training=training, agg=agg, gather=gather, plan=plan)

        bipartite_output_layer = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        scores = nn.sigmoid(bipartite_output_layer(jnp.concatenate(
            [nodes[bgraph.senders], supernodes[bgraph.receivers]],
            -1))[:, 0].astype(jnp.float32))
        scores = jnp.where(bgraph.edge_mask, scores, 0.0)
        return bgraph, scores, intermediate, aux


class GMRT(nn.Module):
    """gMRT: BC with single-layer encoders instead of the IN stack."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, node_mask=None, training: bool = False):
        cfg = self.cfg
        directed = bidirectionalize(graph)
        work, agg, gather, plan = _work_graph(cfg, directed, x.shape[0])
        embeddings, nodes, edges = GMRTEncoders(cfg)(x, work)
        nodes, supernodes, (bgraph, bweights), aux = HierarchicalGNNBlock(
            cfg, l1_norm_supernode_init=True, emb_output=False)(
                embeddings, nodes, edges, work,
                node_mask=node_mask, training=training, agg=agg, gather=gather, plan=plan)

        bipartite_output_layer = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=1,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.compute_dtype)
        scores = nn.sigmoid(bipartite_output_layer(jnp.concatenate(
            [nodes[bgraph.senders], supernodes[bgraph.receivers]],
            -1))[:, 0].astype(jnp.float32))
        scores = jnp.where(bgraph.edge_mask, scores, 0.0)
        return bgraph, scores, embeddings, aux
