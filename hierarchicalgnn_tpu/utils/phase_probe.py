"""Per-phase timing probes: pooling and dynamic graph construction.

The gMRT pipeline logs per-epoch ``pooling_time`` and
``graph_construct_time`` accumulated from in-forward timers (reference
``Modules/gMRT/gmrt_base.py:61-73``, counters in
``Modules/gMRT/Models/HGNN_GMM.py:89-100,177-234``).  Under jit the forward
is one fused program, so wall-clock phase timing is measured here with
standalone jitted probes that run the identical phase math (same ops, same
shapes, same hparams) on the model's intermediate embeddings.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.ops.connected import cluster_labels
from hierarchicalgnn_tpu.ops.gmm import fit_gmm2, solve_cut
from hierarchicalgnn_tpu.ops.knn import knn
from hierarchicalgnn_tpu.ops.sddmm import edge_cosine_likelihood
from hierarchicalgnn_tpu.ops.segment import segment_mean


class PhaseProbes:
    """Jitted pooling / graph-construction probes for one config."""

    def __init__(self, hparams: dict):
        self.hparams = hparams
        min_cluster = int(hparams.get("min_cluster_size", 3))
        gran = float(hparams.get("cluster_granularity", 0))
        gmm_iters = int(hparams.get("gmm_iters", 60))
        max_clusters = int(hparams["max_clusters"])
        k_super = int(hparams.get("supergraph_sparsity", 10))
        k_bip = int(hparams.get("bipartitegraph_sparsity", 5))
        block = int(hparams.get("knn_block_size", 1024))

        @jax.jit
        def pooling(embeddings, senders, receivers, edge_mask, node_mask):
            lik = edge_cosine_likelihood(embeddings, senders, receivers,
                                         mask=edge_mask)
            gmm = fit_gmm2(lik, edge_mask, iters=gmm_iters)
            cut, _ = solve_cut(gmm, gran)
            keep = edge_mask & (lik >= cut)
            clusters, n_clusters = cluster_labels(
                senders, receivers, keep, embeddings.shape[0],
                min_cluster_size=min_cluster, node_mask=node_mask)
            in_cluster = clusters >= 0
            seg = jnp.where(in_cluster, clusters, 0)
            means = segment_mean(embeddings, seg, max_clusters,
                                 mask=in_cluster)
            return clusters, n_clusters, means

        @jax.jit
        def construct(embeddings, means, node_mask, n_clusters):
            cvalid = jnp.arange(means.shape[0]) < n_clusters
            s_idx, _ = knn(means, means, k_super, 1e9, q_mask=cvalid,
                           p_mask=cvalid, block_size=block)
            b_idx, _ = knn(embeddings, means, k_bip, 1e9, q_mask=node_mask,
                           p_mask=cvalid, block_size=block)
            return s_idx, b_idx

        self._pooling = pooling
        self._construct = construct

    def measure(self, embeddings, graph, node_mask) -> dict[str, float]:
        """Returns {'pooling_time', 'graph_construct_time'} in seconds."""
        t0 = time.perf_counter()
        clusters, n_clusters, means = self._pooling(
            embeddings, graph.senders, graph.receivers, graph.edge_mask,
            node_mask)
        float(jnp.sum(means))  # materialize (tunnel-safe)
        pooling_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        s_idx, b_idx = self._construct(embeddings, means, node_mask,
                                       n_clusters)
        float(jnp.sum(b_idx))
        construct_time = time.perf_counter() - t0
        return {"pooling_time": pooling_time,
                "graph_construct_time": construct_time}
