"""Particle <-> track-candidate assignment via min-weight bipartite matching.

Truth labels for the bipartite classification loss come from a maximum-
weight full matching between particles and supernode candidates (reference
``Modules/bipartite_classification_base.py:152-191``): a score matrix sums
bipartite scores per (particle, candidate) pair, augmented with per-particle
virtual candidates (weight 1e-12) so a full matching always exists.

The matching itself (scipy ``min_weight_full_bipartite_matching``, a C++
CSR algorithm) is truth-side and gradient-free, so it runs as a
``jax.pure_callback`` with static padded output shapes.  Everything around
it -- score-matrix accumulation, truth construction -- stays on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hierarchicalgnn_tpu.ops.segment import segment_sum


def _host_matching(pair_scores, n_particles, n_clusters, p_max):
    """Host side: maximize-weight full bipartite matching.

    pair_scores: [P_max, C_max] dense accumulated scores (padded rows/cols
    are zero).  Returns (row_match, col_match, valid) padded to P_max.
    ``col_match`` >= n_clusters marks a virtual-candidate match.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    p = int(n_particles)
    c = int(n_clusters)
    dense = np.asarray(pair_scores)[:p, :c]
    rows, cols = np.nonzero(dense)
    data = dense[rows, cols].astype(np.float64)
    # virtual candidates guarantee feasibility (reference :164-173)
    vrows = np.arange(p)
    vcols = c + np.arange(p)
    mat = csr_matrix(
        (np.concatenate([data, np.full(p, 1e-12)]),
         (np.concatenate([rows, vrows]), np.concatenate([cols, vcols]))),
        shape=(p, c + p),
    )
    row_match, col_match = min_weight_full_bipartite_matching(mat, maximize=True)

    out_r = np.zeros(p_max, np.int32)
    out_c = np.zeros(p_max, np.int32)
    out_v = np.zeros(p_max, bool)
    k = len(row_match)
    out_r[:k] = row_match
    out_c[:k] = col_match
    out_v[:k] = True
    return out_r, out_c, out_v


@functools.partial(jax.jit, static_argnames=("max_clusters", "backend",
                                             "mesh", "axis", "eps_scale"))
def match_particles_to_candidates(scores, bip_senders, bip_receivers,
                                  bip_mask, pid_compact, particle_pid,
                                  n_particles, n_clusters, max_clusters,
                                  backend="auction", mesh=None, axis=None,
                                  eps_scale=1e-3):
    """Returns (truth bool[E_b], row_match, col_match, match_valid).

    truth[e] = True iff the particle of hit bip_senders[e] was matched to
    candidate bip_receivers[e] (reference :176-185).  Noise particles and
    virtual-candidate matches are filtered from the matching.

    ``backend``: "auction" (on-device Bertsekas auction, default -- the
    TPU runtime here has no host-callback support) or "host" (scipy exact
    matching via pure_callback, for CPU/GPU runs and as the test oracle).

    ``mesh``/``axis`` (static, auction backend only): run the auction's
    bidding sweep row-partitioned over that mesh axis via ``shard_map``
    (bit-identical results -- the cross-shard reductions are max/min/int;
    see train/auction.py).  Used by the graph-partitioned train step: the
    warm-flagship matching is otherwise the single largest REPLICATED
    phase of the sharded step (223 ms of 525 ms,
    benchmarks/phases_r05.log).  Falls back to the replicated auction
    when the row count does not divide over the axis.
    """
    p_max = particle_pid.shape[0]

    # (particle, candidate) flat keys; the dense accumulated pair-score
    # matrix is built lazily -- the sharded path never materializes it
    # replicated (the 122k-edge scatter into [P, C] costs ~66 ms at the
    # warm flagship, benchmarks/probe_matching_r05.json vs the phases
    # probe: it was the larger half of the 223 ms matching phase).
    part_of_edge = pid_compact[bip_senders]
    flat = part_of_edge * max_clusters + bip_receivers

    def _dense_pair_scores():
        return segment_sum(
            jnp.where(bip_mask, scores, 0.0), flat, p_max * max_clusters
        ).reshape(p_max, max_clusters)

    if backend == "auction":
        from hierarchicalgnn_tpu.train.auction import auction_match
        g = mesh.shape[axis] if mesh is not None else 0
        e_bip = bip_senders.shape[0]
        if mesh is not None and p_max % g == 0 and e_bip % g == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            # Fused sharded build+match: each device scatters its edge
            # BLOCK into a zero [P, C], one psum_scatter delivers exactly
            # this device's auction row block (scatter work and bidding
            # sweeps both divide by G; rows arrive in the order
            # auction_match's axis mode indexes them).
            def build_and_match(sc, fl, msk, n_p, n_c):
                ps = segment_sum(jnp.where(msk, sc, 0.0), fl,
                                 p_max * max_clusters
                                 ).reshape(p_max, max_clusters)
                ps_local = jax.lax.psum_scatter(
                    ps, axis, scatter_dimension=0, tiled=True)
                return auction_match(ps_local, n_p, n_c, axis=axis,
                                     eps_scale=eps_scale)

            sharded = shard_map(
                build_and_match, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(), P()),
                out_specs=(P(axis), P(axis)), check_vma=False)
            col_match, valid = sharded(scores, flat, bip_mask,
                                       n_particles, n_clusters)
        else:
            col_match, valid = auction_match(_dense_pair_scores(),
                                             n_particles, n_clusters,
                                             eps_scale=eps_scale)
        row_match = jnp.arange(p_max, dtype=jnp.int32)
    else:
        pair_scores = _dense_pair_scores()
        row_match, col_match, valid = jax.pure_callback(
            functools.partial(_host_matching, p_max=p_max),
            (jax.ShapeDtypeStruct((p_max,), jnp.int32),
             jax.ShapeDtypeStruct((p_max,), jnp.int32),
             jax.ShapeDtypeStruct((p_max,), bool)),
            pair_scores, n_particles, n_clusters,
            vmap_method="sequential",  # batched under event-DP vmap
        )

    # noise / virtual filtering (reference :176-177)
    noise_mask = (particle_pid[row_match] != 0) & (col_match < n_clusters) & valid

    # Scatter through a trash slot so filtered rows can't clobber rank 0.
    scatter_idx = jnp.where(noise_mask, row_match, p_max)
    matched = jnp.zeros((p_max + 1,), bool).at[scatter_idx].set(True)[:p_max]
    assignment = (jnp.zeros((p_max + 1,), jnp.int32)
                  .at[scatter_idx].set(col_match)[:p_max])
    row_match = jnp.where(noise_mask, row_match, 0)
    col_match = jnp.where(noise_mask, col_match, 0)

    matched_hits = matched[part_of_edge] & bip_mask
    truth = matched_hits & (assignment[part_of_edge] == bip_receivers)
    return truth, row_match, col_match, noise_mask
