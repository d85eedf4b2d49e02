"""Cell-blocked (grid) fixed-radius kNN for full-event scale.

Replaces the quadratic blockwise brute force of :mod:`ops.knn` at TrackML
full-event sizes (~1e5 hits), the regime the reference runs FRNN's
grid-cell kNN in (reference ``Modules/utils.py:228-239``,
``frnn.frnn_grid_points``; called from embedding sample mining
``Modules/GNNEmbedding/embedding_base.py:111``).

FRNN's uniform 3-D grid does not survive d=8 embedding space (3^d probe
cells), so this is the TPU-native generalization: a learned two-level
coarse/fine decomposition (the "2-level grid" family FRNN belongs to)
with every stage expressed as static-shape MXU matmuls:

  1. **Cells**: M anchor points (strided sample + a few Lloyd refinements,
     each one [N, M] matmul) partition the point set; members bucket into
     a fixed ``[M, cap]`` buffer by a receiver-sort (the same
     rank-and-scatter scheme as ``parallel.graph_shard.partition_edges``).
  2. **Probe**: queries bucket to their nearest cell; each cell's query
     block searches the T cells nearest its anchor -- one
     ``[q_cap, T*cap]`` distance matmul + masked top-k per cell, batched
     through ``lax.map``.
  3. **Certificate**: dynamic early-exit is hostile to XLA, so instead of
     iterating until provably done, one extra ``[q_cap, M]`` comparison
     proves (or refutes) exactness per query: a non-probed cell j can hold
     a better neighbor only if ``(d(q, a_j) - r_j)^2 < min(d_k^2,
     r_max^2)`` with ``r_j`` the cell radius.  The returned ``exact`` flag
     is True iff NO query fails the bound and no bucket overflowed --
     callers get brute-force semantics guaranteed, or a flag telling them
     to rerun with more probes (mirrors the partition ``ok``-flag pattern
     used across this codebase instead of silent corruption).

Complexity vs brute force: ``2*N*M*d + N*(T*cap)*d`` FLOPs instead of
``N^2*d`` -- ~14x fewer at N=131072 (M=512, T=16, cap=512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.ops.segment import segment_max, segment_sum


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pairwise_d2(a, b, b_sqnorm=None):
    """Squared distances [A, B] on the MXU (HIGHEST precision: neighbor
    ranking is sensitive to the default bf16 matmul passes -- same setting
    as ops.knn._block_topk)."""
    dots = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    if b_sqnorm is None:
        b_sqnorm = jnp.sum(jnp.square(b), axis=-1)
    d2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True) + b_sqnorm[None, :] \
        - 2.0 * dots
    return jnp.maximum(d2, 0.0)


def _bucket(ids, valid, n_cells: int, cap: int):
    """Rank-and-scatter rows into a [n_cells, cap] index buffer (-1 fill).

    Returns (buffer, counts [n_cells], ok) -- ``ok`` False if any cell
    received more than ``cap`` members (those members are dropped).
    """
    n = ids.shape[0]
    key = jnp.where(valid, ids, n_cells)
    order = jnp.argsort(key)
    ids_s = key[order]
    counts = segment_sum(jnp.ones((n,), jnp.int32), ids_s, n_cells + 1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[ids_s]
    keep = (ids_s < n_cells) & (rank < cap)
    dest = jnp.where(keep, ids_s * cap + rank, n_cells * cap)
    buf = jnp.full((n_cells * cap + 1,), -1, jnp.int32).at[dest].set(
        jnp.where(keep, order.astype(jnp.int32), -1))
    ok = jnp.logical_not(jnp.any(counts[:n_cells] > cap))
    return buf[:-1].reshape(n_cells, cap), counts[:n_cells], ok


def _build_cells(points, p_valid, n_cells: int, lloyd_iters: int):
    """Anchor selection: strided sample over valid points + Lloyd steps
    (each an [N, M] matmul assignment + segment-mean update; empty cells
    keep their previous anchor)."""
    npt = points.shape[0]
    # valid points first (stable), then stride so anchors spread over them
    perm = jnp.argsort(jnp.logical_not(p_valid), stable=True)
    n_valid = jnp.maximum(jnp.sum(p_valid.astype(jnp.int32)), 1)
    pos = (jnp.arange(n_cells) * n_valid) // n_cells
    anchors = points[perm[pos]]

    for _ in range(lloyd_iters):
        d2 = _pairwise_d2(points, anchors)
        assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
        seg = jnp.where(p_valid, assign, n_cells)
        sums = segment_sum(points, seg, n_cells + 1)[:n_cells]
        cnt = segment_sum(jnp.ones((npt,), jnp.float32), seg,
                          n_cells + 1)[:n_cells]
        anchors = jnp.where(cnt[:, None] > 0,
                            sums / jnp.maximum(cnt, 1.0)[:, None], anchors)
    return anchors


@functools.partial(jax.jit, static_argnames=(
    "k", "n_cells", "n_probe", "cell_capacity", "lloyd_iters",
    "batch_cells"))
def grid_knn(queries, points, k, r_max, q_mask=None, p_mask=None,
             n_cells=64, n_probe=8, cell_capacity=None, lloyd_iters=2,
             batch_cells=8):
    """Fixed-radius kNN via two-level cell decomposition.

    Same contract as :func:`ops.knn.knn` -- (idx [Q, k] int32 with -1
    padding, sq_dists [Q, k]) -- plus an ``exact`` bool: True iff the
    result provably equals the brute-force answer (per-query triangle-
    inequality certificate over non-probed cells, no bucket overflow).

    ``r_max`` may be a traced scalar (the adaptive radius buffer).
    """
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    nq, npt = queries.shape[0], points.shape[0]
    k = min(k, npt)
    n_probe = min(n_probe, n_cells)
    p_valid = jnp.ones((npt,), bool) if p_mask is None else p_mask
    q_valid = jnp.ones((nq,), bool) if q_mask is None else q_mask
    if cell_capacity is None:
        # 4x the mean occupancy: track-like data clusters hard and two
        # Lloyd refinements only roughly balance the cells; overflow
        # trips the exact flag, so err roomy (cost is probe-matmul width)
        cell_capacity = _round_up(4 * npt // n_cells, 8)
    cap = cell_capacity
    q_cap = _round_up(4 * nq // n_cells, 8)
    if k > n_probe * cap:
        raise ValueError(f"k={k} exceeds the probe budget "
                         f"n_probe*cell_capacity={n_probe * cap}")

    anchors = _build_cells(points, p_valid, n_cells, lloyd_iters)
    a_sqnorm = jnp.sum(jnp.square(anchors), axis=-1)

    # point assignment + cell radii
    d2_pa = jnp.where(p_valid[:, None], _pairwise_d2(points, anchors,
                                                     a_sqnorm), jnp.inf)
    cell_p = jnp.argmin(d2_pa, axis=1).astype(jnp.int32)
    own_d2 = jnp.min(d2_pa, axis=1)
    r2_cell = segment_max(jnp.where(p_valid, own_d2, 0.0),
                          jnp.where(p_valid, cell_p, 0), n_cells,
                          mask=p_valid, empty_value=0.0)
    r_cell = jnp.sqrt(r2_cell)
    # bucket overflow drops members -> p_ok/q_ok gate the exact flag
    pbuf, _, p_ok = _bucket(cell_p, p_valid, n_cells, cap)

    # query assignment (reuse the point assignment when queries is points)
    if queries is points and q_mask is p_mask:
        cell_q = cell_p
    else:
        d2_qa = jnp.where(q_valid[:, None], _pairwise_d2(queries, anchors,
                                                         a_sqnorm), jnp.inf)
        cell_q = jnp.argmin(d2_qa, axis=1).astype(jnp.int32)
    qbuf, _, q_ok = _bucket(cell_q, q_valid, n_cells, q_cap)

    # probe list: T nearest cells per cell (self included at distance 0)
    d2_aa = _pairwise_d2(anchors, anchors, a_sqnorm)
    _, probe = jax.lax.top_k(-d2_aa, n_probe)  # [M, T]
    probed_hot = jnp.zeros((n_cells, n_cells), bool).at[
        jnp.arange(n_cells)[:, None], probe].set(True)

    r2 = jnp.asarray(r_max, jnp.float32) ** 2
    p_sqnorm = jnp.sum(jnp.square(points), axis=-1)

    def one_cell(ci):
        cand = pbuf[probe[ci]].reshape(-1)          # [T*cap] point ids
        cand_ok = cand >= 0
        cand_pts = points[jnp.maximum(cand, 0)]
        qi = qbuf[ci]                               # [q_cap] query ids
        q_pts = queries[jnp.maximum(qi, 0)]

        d2 = _pairwise_d2(q_pts, cand_pts,
                          p_sqnorm[jnp.maximum(cand, 0)])
        d2 = jnp.where(cand_ok[None, :], d2, jnp.inf)
        neg_top, slot = jax.lax.top_k(-d2, k)
        top_d2 = -neg_top
        top_idx = jnp.where(jnp.isfinite(top_d2),
                            cand[slot], -1).astype(jnp.int32)

        # exactness certificate: a NON-probed cell j can hold a neighbor
        # better than the k-th found (or an in-radius point we missed)
        # only if (d(q, a_j) - r_j)^2 < min(d_k^2, r_max^2).
        kth = top_d2[:, -1]
        lim = jnp.minimum(kth, r2)                  # [q_cap]
        d_qa = jnp.sqrt(_pairwise_d2(q_pts, anchors, a_sqnorm))
        bound2 = jnp.square(jnp.maximum(d_qa - r_cell[None, :], 0.0))
        unsafe = jnp.logical_not(probed_hot[ci])[None, :] & \
            (bound2 < lim[:, None])
        exact_q = jnp.logical_not(jnp.any(unsafe, axis=1))
        return qi, top_idx, top_d2, exact_q

    cells = jnp.arange(n_cells)
    try:
        qi_all, idx_all, d2_all, ex_all = jax.lax.map(
            one_cell, cells, batch_size=batch_cells)
    except TypeError:  # older jax without batch_size
        qi_all, idx_all, d2_all, ex_all = jax.lax.map(one_cell, cells)

    # scatter per-cell results back to query order
    flat_q = qi_all.reshape(-1)
    ok_rows = flat_q >= 0
    dest = jnp.where(ok_rows, flat_q, nq)
    idx = jnp.full((nq + 1, k), -1, jnp.int32).at[dest].set(
        idx_all.reshape(-1, k))[:nq]
    d2 = jnp.full((nq + 1, k), jnp.inf).at[dest].set(
        d2_all.reshape(-1, k))[:nq]
    exact_per_q = jnp.zeros((nq + 1,), bool).at[dest].set(
        ex_all.reshape(-1))[:nq]

    valid = (d2 <= r2) & (idx >= 0) & q_valid[:, None]
    idx = jnp.where(valid, idx, -1)
    d2 = jnp.where(valid, d2, jnp.inf)

    exact = p_ok & q_ok & jnp.all(exact_per_q | jnp.logical_not(q_valid))
    return idx, d2, exact


def grid_knn_graph(embeddings, r, k, mask=None, n_cells=64, n_probe=8,
                   **kwargs):
    """kNN graph of a point set against itself (grid backend): padded COO
    edges + the exactness flag.  Drop-in for :func:`ops.knn.knn_graph`."""
    from hierarchicalgnn_tpu.ops.knn import knn_to_edges

    idx, d2, exact = grid_knn(embeddings, embeddings, k, r, q_mask=mask,
                              p_mask=mask, n_cells=n_cells, n_probe=n_probe,
                              **kwargs)
    senders, receivers, emask = knn_to_edges(idx)
    return senders, receivers, emask, d2.reshape(-1), exact
