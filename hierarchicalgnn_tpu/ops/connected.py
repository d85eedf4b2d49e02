"""On-device connected components and cluster labeling.

Replaces cuGraph ``connected_components`` used for GMM-cut cluster
extraction (reference ``Modules/BipartiteClassification/Models/
HGNN_GMM.py:215-232``) and EC track building (reference
``Modules/EdgeClassifier/edge_classifier_base.py:157-165``).

Algorithm: min-label propagation with pointer jumping inside a
``lax.while_loop``.  One iteration does a hop (each node takes the min label
over its neighborhood, a pair of segment-min reductions) followed by
log-jumps (label <- label[label]), so convergence is O(log diameter) --
a handful of iterations for track-like chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.ops.segment import segment_min, segment_sum


@functools.partial(jax.jit, static_argnames=("num_nodes", "max_iters",
                                             "bidirected"))
def connected_components(senders, receivers, edge_mask, num_nodes,
                         node_mask=None, max_iters=64, bidirected=False):
    """Component labels in [0, N): each node maps to the min node index
    reachable from it.  Isolated valid nodes keep their own index; invalid
    nodes get label = their own index as well (callers mask them out).

    ``bidirected=True`` promises every edge's reverse is also present (the
    models' doubled graphs) -- then one scatter per hop suffices.  Scatters
    are the latency bound on TPU, so hops use a single edge-min scatter and
    several cheap pointer-jump gathers compress toward roots between hops.
    """
    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)
    int_max = jnp.iinfo(jnp.int32).max

    def hop(labels):
        l_edge = jnp.minimum(labels[senders], labels[receivers])
        m = segment_min(l_edge, receivers, num_nodes, mask=edge_mask,
                        empty_value=int_max)
        if not bidirected:
            m = jnp.minimum(m, segment_min(l_edge, senders, num_nodes,
                                           mask=edge_mask,
                                           empty_value=int_max))
        return jnp.minimum(labels, m)

    def jump(labels):
        return jnp.minimum(labels, labels[labels])

    def body(state):
        labels, _, it = state
        new = hop(labels)
        new = jump(jump(jump(new)))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.asarray(True), 0))
    if node_mask is not None:
        labels = jnp.where(node_mask, labels, jnp.arange(num_nodes, dtype=jnp.int32))
    return labels


def compact_labels(labels, valid):
    """Relabel arbitrary representative labels to dense [0, C); invalid -> -1.

    Mirrors ``labels.unique(return_inverse=True)[1]`` in the reference
    cluster-labeling path (``Modules/BipartiteClassification/Models/
    HGNN_GMM.py:179``).  Returns (dense_labels int32[N], num_clusters).
    """
    n = labels.shape[0]
    present = jnp.zeros((n,), jnp.int32)
    present = present.at[jnp.where(valid, labels, 0)].max(valid.astype(jnp.int32))
    new_id = jnp.cumsum(present) - 1  # representative index -> dense id
    dense = jnp.where(valid, new_id[labels], -1).astype(jnp.int32)
    return dense, jnp.sum(present)


def connected_components_sorted(plan, keep_sorted, num_nodes,
                                node_mask=None, max_iters=64,
                                interpret=False):
    """CC over a receiver-sorted plan using the Pallas VPU min kernel.

    Replaces the scatter-min hop (which serializes per element on TPU,
    ~5 ms/iteration at TrackML sizes) with a blocked-CSR lane-masked min.
    The plan's graph must be bidirected (the models' doubled graphs).
    ``keep_sorted`` masks edges in plan order (e.g. the GMM cut).
    """
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        sorted_segment_min_i32,
    )

    int_max = jnp.iinfo(jnp.int32).max
    s, r = plan.senders_sorted, plan.receivers_sorted
    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)

    def hop(labels):
        l_edge = jnp.minimum(labels[s], labels[r])
        l_edge = jnp.where(keep_sorted, l_edge, int_max)
        m = sorted_segment_min_i32(l_edge, plan, interpret)
        new = jnp.minimum(labels, m)
        for _ in range(3):  # pointer jumps: cheap gathers, geometric compression
            new = jnp.minimum(new, new[new])
        return new

    # two hops per while-body: halves the per-iteration convergence-check
    # sync without giving up the early exit
    def body(state):
        labels, _, it = state
        new = hop(hop(labels))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters // 2)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), 0))
    if node_mask is not None:
        labels = jnp.where(node_mask, labels,
                           jnp.arange(num_nodes, dtype=jnp.int32))
    return labels


def cluster_labels_sorted(plan, keep_sorted, num_nodes, min_cluster_size=1,
                          node_mask=None, interpret=False):
    """Plan-based variant of :func:`cluster_labels` (Pallas CC hop)."""
    labels = connected_components_sorted(plan, keep_sorted, num_nodes,
                                         node_mask=node_mask,
                                         interpret=interpret)
    nm = jnp.ones((num_nodes,), bool) if node_mask is None else node_mask
    sizes = segment_sum(nm.astype(jnp.int32), labels, num_nodes)
    keep_nodes = nm & (sizes[labels] >= min_cluster_size)
    return compact_labels(labels, keep_nodes)


@functools.partial(jax.jit, static_argnames=("num_nodes", "min_cluster_size",
                                             "bidirected"))
def cluster_labels(senders, receivers, edge_mask, num_nodes,
                   min_cluster_size=1, node_mask=None, bidirected=False):
    """Connected components -> dense cluster ids, dropping small clusters.

    Equivalent of reference ``get_cluster_labels`` (``Modules/
    BipartiteClassification/Models/HGNN_GMM.py:172-181``): components with
    fewer than ``min_cluster_size`` members get label -1, survivors are
    renumbered 0..C-1 in ascending representative order.
    Returns (clusters int32[N], num_clusters int32).
    """
    labels = connected_components(senders, receivers, edge_mask, num_nodes,
                                  node_mask=node_mask, bidirected=bidirected)
    nm = jnp.ones((num_nodes,), bool) if node_mask is None else node_mask
    sizes = segment_sum(nm.astype(jnp.int32), labels, num_nodes)
    keep = nm & (sizes[labels] >= min_cluster_size)
    return compact_labels(labels, keep)
