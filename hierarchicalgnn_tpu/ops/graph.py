"""Static-shape graph containers and structural edge operations.

The reference represents graphs as dynamic ``edge_index`` int64 tensors of
shape [2, E] (see reference ``Modules/utils.py:241-252`` and pervasive
``graph[0]/graph[1]`` indexing).  On TPU every shape must be static under
jit, so edges live in fixed-capacity arrays with a validity mask.  Padded
edge slots point at node 0 but are masked out of every reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Graph(NamedTuple):
    """A padded COO edge list.

    senders/receivers: int32[E_pad] -- padded entries are 0.
    edge_mask: bool[E_pad] -- True for real edges.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.senders.shape[0]

    def num_edges(self) -> jnp.ndarray:
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    @staticmethod
    def from_edge_index(edge_index, capacity: int | None = None) -> "Graph":
        """Build from a dense [2, E] edge index (e.g. host-side data)."""
        edge_index = jnp.asarray(edge_index, dtype=jnp.int32)
        e = edge_index.shape[1]
        cap = capacity if capacity is not None else e
        pad = cap - e
        if pad < 0:
            raise ValueError(f"capacity {cap} < num edges {e}")
        senders = jnp.pad(edge_index[0], (0, pad))
        receivers = jnp.pad(edge_index[1], (0, pad))
        mask = jnp.pad(jnp.ones((e,), dtype=bool), (0, pad))
        return Graph(senders, receivers, mask)


def bidirectionalize(graph: Graph) -> Graph:
    """Double the graph with flipped edges.

    Equivalent of ``torch.cat([graph, graph.flip(0)], dim=1)`` applied by every
    reference model before message passing (reference
    ``Modules/EdgeClassifier/Models/IN.py:122``,
    ``Modules/BipartiteClassification/Models/HGNN_GMM.py:328``).  The first
    half of the output holds the forward direction so paired-edge heads can
    split at ``capacity``.
    """
    return Graph(
        senders=jnp.concatenate([graph.senders, graph.receivers]),
        receivers=jnp.concatenate([graph.receivers, graph.senders]),
        edge_mask=jnp.concatenate([graph.edge_mask, graph.edge_mask]),
    )


def compact_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Stable permutation moving True entries to the front.

    Returns int32 indices such that ``x[perm]`` lists valid entries first in
    their original order.  The workhorse for turning masked arrays into
    "dense prefix" layouts without dynamic shapes.
    """
    # argsort of (not mask) is stable in jnp -> valid entries keep order.
    return jnp.argsort(jnp.logical_not(mask), stable=True).astype(jnp.int32)


def _lexsort_edges(senders, receivers, tiebreak=None):
    keys = [receivers, senders] if tiebreak is None else [tiebreak, receivers, senders]
    return jnp.lexsort(keys)


def sort_edges_by(graph: Graph, key: jnp.ndarray) -> tuple[Graph, jnp.ndarray]:
    """Sort edges by an int key; padded edges are pushed to the end.

    Returns the sorted graph and the permutation (for carrying edge data).
    """
    big = jnp.iinfo(jnp.int32).max
    k = jnp.where(graph.edge_mask, key, big)
    perm = jnp.argsort(k, stable=True)
    return (
        Graph(graph.senders[perm], graph.receivers[perm], graph.edge_mask[perm]),
        perm.astype(jnp.int32),
    )


def dedup_edges(senders, receivers, edge_mask):
    """Mark the first occurrence of every distinct (sender, receiver) pair.

    Returns a boolean mask selecting unique valid edges.  Implements the
    dedup half of cuGraph ``symmetrize`` (reference
    ``Modules/gnn_utils.py:197-199``) with a sort + neighbor-compare, which
    is O(E log E) and static-shape friendly.
    """
    # Push invalid edges to the end by sorting with mask as major key.
    order = jnp.lexsort([receivers, senders, jnp.logical_not(edge_mask)])
    s, r, m = senders[order], receivers[order], edge_mask[order]
    first = jnp.ones_like(m)
    same_prev = (s[1:] == s[:-1]) & (r[1:] == r[:-1]) & m[:-1]
    first = first.at[1:].set(jnp.logical_not(same_prev))
    keep_sorted = first & m
    # Scatter back to original positions.
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep


def symmetrize(graph: Graph) -> Graph:
    """Union of the graph with its reverse, deduplicated.

    TPU-native replacement for cuGraph ``symmetrize`` used by the supergraph
    construction (reference ``Modules/gnn_utils.py:197-199``).  Output
    capacity is 2x the input; duplicate and padded slots are masked off.
    """
    bi = bidirectionalize(graph)
    keep = dedup_edges(bi.senders, bi.receivers, bi.edge_mask)
    return Graph(bi.senders, bi.receivers, keep)


def count_degrees(graph: Graph, num_nodes: int, direction: str = "in") -> jnp.ndarray:
    seg = graph.receivers if direction == "in" else graph.senders
    ones = graph.edge_mask.astype(jnp.int32)
    return jax.ops.segment_sum(ones, seg, num_segments=num_nodes)
