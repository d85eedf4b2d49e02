"""Differentiable-weighted dynamic kNN graph construction.

Re-design of ``DynamicGraphConstruction`` (reference
``Modules/gnn_utils.py:171-218``): build a kNN graph between two embedding
sets under stop-gradient, then compute differentiable per-edge weights from
the endpoint dot products.  All pieces run on device: the FRNN CUDA kNN
becomes :mod:`ops.knn`, cuGraph ``symmetrize`` becomes the sort-based
:func:`ops.graph.symmetrize`, and the BatchNorm regularization of the edge
logits is a masked batch norm excluding padded slots.

Stateful buffers, persisted in checkpoints like the reference's registered
buffers (``gnn_utils.py:181``):
  * ``knn_radius`` -- EMA of the max edge length, ``r <- 0.9 r + 0.11 max``
    during training so the fixed-radius query keeps enough neighbors.
  * batch-norm running statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hierarchicalgnn_tpu.ops.knn import knn as knn_query
from hierarchicalgnn_tpu.ops.knn import knn_to_edges
from hierarchicalgnn_tpu.ops.graph import Graph, symmetrize
from hierarchicalgnn_tpu.ops.sddmm import edge_dot, edge_dot_from_knn
from hierarchicalgnn_tpu.models.mlp import MaskedBatchNorm


class DynamicGraphConstruction(nn.Module):
    """weighting_function: 'sigmoid' (supergraph) or 'exp' (bipartite)."""

    weighting_function: str = "sigmoid"
    k: int = 10
    sym: bool = False
    norm: bool = False
    return_logits: bool = False
    knn_block_size: int = 1024
    # Pooled-space partition (parallel/graph_shard.py): the QUERY rows are
    # sharded across this mesh axis (each device mines its own block), so
    # the radius EMA, batch-norm moments and weight normalization reduce
    # across it for exact-parity global statistics.
    axis_name: str | None = None

    @nn.compact
    def __call__(self, src_embeddings, dst_embeddings, training: bool,
                 src_mask=None, dst_mask=None):
        """Returns (Graph, weights[E,1][, logits[E]]).

        Edge capacity is Q*k (2*Q*k when ``sym``).  Padded slots carry zero
        weight and are masked in the Graph.
        """
        knn_radius = self.variable(
            "buffers", "knn_radius", lambda: jnp.ones((1,), jnp.float32))
        weight_normalization = MaskedBatchNorm(axis_name=self.axis_name)

        src = jax.lax.stop_gradient(src_embeddings)
        dst = jax.lax.stop_gradient(dst_embeddings)

        idx, d2 = knn_query(src, dst, self.k, knn_radius.value[0],
                            q_mask=src_mask, p_mask=dst_mask,
                            block_size=self.knn_block_size)
        senders, receivers, emask = knn_to_edges(idx)
        graph = Graph(senders, receivers, emask)
        d2_flat = d2.reshape(-1)
        if self.sym:
            graph = symmetrize(graph)

        if training and not self.is_initializing():
            # EMA of the max neighbor distance (reference :203-205) -- from
            # the kNN's own d2 output, no endpoint row gather.  Distances
            # are symmetric, so the max over the symmetrized graph equals
            # the max over the raw kNN edges.
            max_d2 = jnp.max(jnp.where(emask, d2_flat, 0.0))
            if self.axis_name:
                max_d2 = jax.lax.pmax(max_d2, self.axis_name)
            knn_radius.value = (0.9 * knn_radius.value
                                + 0.11 * jnp.sqrt(max_d2))

        # Differentiable edge weights from endpoint dot products (:207-213).
        # Unsymmetrized graphs keep the kNN edge order, so the dot is
        # algebra on the kNN's d2 byproduct (edge_dot_from_knn): the MXU
        # already computed every candidate dot while ranking neighbors, and
        # the [E, latent] endpoint row gathers vanish from the forward.
        if self.sym:
            likelihood = edge_dot(src_embeddings, dst_embeddings,
                                  graph.senders, graph.receivers)
        else:
            likelihood = edge_dot_from_knn(
                src_embeddings, dst_embeddings, graph.senders,
                graph.receivers, graph.edge_mask, d2_flat)
        logits = weight_normalization(likelihood, graph.edge_mask, training)
        if self.weighting_function == "sigmoid":
            weights = jax.nn.sigmoid(logits)
        elif self.weighting_function == "exp":
            weights = jnp.exp(logits)
        else:
            raise ValueError(self.weighting_function)

        if self.norm:
            m = graph.edge_mask.astype(weights.dtype)
            sums = jnp.sum(weights * m), jnp.sum(m)
            if self.axis_name and not self.is_initializing():
                sums = jax.lax.psum(sums, self.axis_name)
            mean = sums[0] / jnp.maximum(sums[1], 1.0)
            weights = weights / jnp.maximum(mean, 1e-12)

        weights = jnp.where(graph.edge_mask, weights, 0.0)[:, None]
        if self.return_logits:
            return graph, weights, logits
        return graph, weights
