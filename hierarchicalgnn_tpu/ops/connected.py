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


@functools.partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def connected_components(senders, receivers, edge_mask, num_nodes,
                         node_mask=None, max_iters=64):
    """Component labels in [0, N): each node maps to the min node index
    reachable from it.  Isolated valid nodes keep their own index; invalid
    nodes get label = their own index as well (callers mask them out).
    """
    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)

    def hop(labels):
        # Gather endpoint labels and push min across the (undirected) edge.
        m_to_recv = segment_min(labels[senders], receivers, num_nodes,
                                mask=edge_mask, empty_value=jnp.iinfo(jnp.int32).max)
        m_to_send = segment_min(labels[receivers], senders, num_nodes,
                                mask=edge_mask, empty_value=jnp.iinfo(jnp.int32).max)
        return jnp.minimum(labels, jnp.minimum(m_to_recv, m_to_send))

    def jump(labels):
        return jnp.minimum(labels, labels[labels])

    def body(state):
        labels, _, it = state
        new = hop(labels)
        new = jump(jump(new))
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


@functools.partial(jax.jit, static_argnames=("num_nodes", "min_cluster_size"))
def cluster_labels(senders, receivers, edge_mask, num_nodes,
                   min_cluster_size=1, node_mask=None):
    """Connected components -> dense cluster ids, dropping small clusters.

    Equivalent of reference ``get_cluster_labels`` (``Modules/
    BipartiteClassification/Models/HGNN_GMM.py:172-181``): components with
    fewer than ``min_cluster_size`` members get label -1, survivors are
    renumbered 0..C-1 in ascending representative order.
    Returns (clusters int32[N], num_clusters int32).
    """
    labels = connected_components(senders, receivers, edge_mask, num_nodes,
                                  node_mask=node_mask)
    nm = jnp.ones((num_nodes,), bool) if node_mask is None else node_mask
    sizes = segment_sum(nm.astype(jnp.int32), labels, num_nodes)
    keep = nm & (sizes[labels] >= min_cluster_size)
    return compact_labels(labels, keep)
