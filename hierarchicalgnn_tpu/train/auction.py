"""On-device auction algorithm for maximum-weight bipartite matching.

The reference computes assignment truth with scipy
``min_weight_full_bipartite_matching`` on host per training step
(reference ``bipartite_classification_base.py:164-174``).  A host callback
reproduces that, but the TPU runtime used here does not support host
callbacks inside jit at all -- so the matching must run on device.

Bertsekas' auction algorithm, vectorized over rows: every unassigned
particle bids ``(best - second_best + eps)`` above the current price of its
best-value candidate; highest bidder per candidate wins, displacing the
previous owner.  The reference's virtual candidates (one private
per-particle escape at value 1e-12, guaranteeing feasibility,
``:164-173``) become an always-available private option -- prices only
rise, so once the virtual option is a row's best it stays optimal and the
row retires.  With eps below the value resolution the result matches the
exact optimum; a fixed iteration cap bounds the loop (rows still
unassigned at the cap take their virtual escape, i.e. count as unmatched
-- a conservative truth label).

Rounds are bounded by **eps-scaling** (Bertsekas): bidding starts at a
coarse eps derived from the score range and shrinks it geometrically,
carrying prices between phases (each phase restarts with every row
unassigned).  Price wars between near-tie columns cost
O(range/eps) rounds at fixed eps -- the warm-training regime (thousands
of particles over similar mid-training scores) hit the round cap, ~80 ms
per step -- while scaling resolves the same instance in a few rounds per
phase.  The optimality bound is unchanged: it depends only on
eps-complementary-slackness of the *final* assignment at the final eps,
not on price history.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VIRTUAL_VALUE = 1e-12
NEG = -1e30


@functools.partial(jax.jit, static_argnames=("max_iters",))
def auction_match(pair_scores, n_particles, n_clusters, eps=1e-4,
                  max_iters=256):
    """Maximum-weight matching of particles to candidates.

    pair_scores: [P, C] dense accumulated scores (padded entries ignored).
    Returns (col_match int32[P], matched bool[P]): ``matched`` is False for
    padded rows and rows that took their virtual escape.

    Best/second-best per row come from fused max reductions over
    ``a - prices`` (no materialized [P, C] temporaries -- ``lax.top_k`` and
    scatter-``.set`` row-masking both cost several extra HBM passes), and
    the loop is a ``while_loop`` with a hard round cap -- typical instances
    exit in a handful of rounds.  Rows whose only alternative is the
    virtual escape bid their full value, so single-column pile-ups (the
    early-training regime with one cluster and thousands of particles)
    resolve in one round; only adversarial near-tie wars between real
    columns approach the cap, and rows still unassigned there take the
    conservative unmatched label.
    """
    p, c = pair_scores.shape
    row_valid = jnp.arange(p) < n_particles
    col_valid = jnp.arange(c) < n_clusters
    a = jnp.where(row_valid[:, None] & col_valid[None, :],
                  pair_scores.astype(jnp.float32), NEG)

    eps_final = jnp.float32(eps)
    # eps-scaling start: a quarter of the score range; shrink x8 per phase
    amax = jnp.max(jnp.where(row_valid[:, None] & col_valid[None, :],
                             pair_scores.astype(jnp.float32), 0.0))
    eps0 = jnp.maximum(amax * 0.25, eps_final)
    theta = jnp.float32(8.0)
    unassigned_init = jnp.where(row_valid, -1, -2).astype(jnp.int32)

    def bid_round(prices, assign, eps_cur, it):
        # assign: -1 unassigned, -2 virtual, >=0 candidate id
        unassigned = (assign == -1) & row_valid

        net = a - prices[None, :]
        v1 = jnp.max(net, axis=1)
        j1 = jnp.argmax(net, axis=1).astype(jnp.int32)
        # second-best via a fused masked reduction (the where re-derives
        # from net inside the same fusion; nothing is written back to HBM)
        v2 = jnp.max(jnp.where(
            jnp.arange(c)[None, :] == j1[:, None], NEG, net), axis=1)

        # private virtual escape: no competition, prices never drop within
        # a phase, so a virtual-best row sits out the rest of the phase
        take_virtual = unassigned & (VIRTUAL_VALUE >= v1)
        bid_rows = unassigned & jnp.logical_not(take_virtual)
        bid_amount = (prices[j1] + (v1 - jnp.maximum(v2, VIRTUAL_VALUE))
                      + eps_cur)

        # column auction: highest bid wins; tie-break by row index
        bids = jnp.where(bid_rows, bid_amount, NEG)
        best_bid = jax.ops.segment_max(bids, j1, num_segments=c)
        is_best = bid_rows & (bids >= best_bid[j1])
        # unique winner per column: lowest row index among best bidders
        winner_row = jax.ops.segment_min(
            jnp.where(is_best, jnp.arange(p), p), j1, num_segments=c)
        won = is_best & (winner_row[j1] == jnp.arange(p))

        # displace previous owners of won columns (scatter-OR: plain .set
        # has undefined ordering and non-winners would clobber column 0)
        col_won = jnp.zeros((c,), bool).at[jnp.where(won, j1, 0)].max(won)
        displaced = (assign >= 0) & col_won[jnp.clip(assign, 0, c - 1)]

        new_assign = jnp.where(displaced, -1, assign)
        new_assign = jnp.where(won, j1, new_assign)
        new_assign = jnp.where(take_virtual, -2, new_assign)
        new_prices = prices.at[jnp.where(won, j1, 0)].max(
            jnp.where(won, bids, NEG))
        return new_prices, new_assign, eps_cur, it + 1

    def next_phase(prices, assign, eps_cur, it):
        # Phase done at eps_cur > eps_final: shrink eps and keep prices and
        # assignments, except that (a) columns nobody owns get their price
        # reset to zero and (b) rows violating the new
        # eps-complementary-slackness (narrow winners) are unassigned --
        # iterated to a fixpoint, since each unassignment vacates a column
        # whose price reset can raise other rows' best alternative.  The
        # fixpoint terminates: the unhappy set only grows.  Naive full
        # reassignment instead strands contested columns -- the price
        # overshoots by up to the coarse eps, the evicted owner flees to
        # the fixed-price virtual escape, and the column's value is lost.
        # The invariant restored here -- every positively-priced column is
        # owned at termination (prices never fall inside a phase, and
        # bidding transfers ownership atomically) -- is what the
        # n*eps_final optimality bound needs.  Virtual rows stay retired
        # within the cascade only if still justified: the reset can revive
        # them, so they re-enter as unassigned when v1 > VIRTUAL.
        eps_new = jnp.maximum(eps_cur / theta, eps_final)

        def effective(assign):
            owned = (jnp.zeros((c,), bool)
                     .at[jnp.clip(assign, 0, c - 1)]
                     .max(assign >= 0))
            return jnp.where(owned, prices, 0.0)

        def settle_body(state):
            assign, _ = state
            net = a - effective(assign)[None, :]
            v1 = jnp.max(net, axis=1)
            assigned = assign >= 0
            cur = jnp.take_along_axis(
                net, jnp.clip(assign, 0, c - 1)[:, None], axis=1)[:, 0]
            unhappy = assigned & (cur < v1 - eps_new)
            revived = (assign == -2) & row_valid & (v1 > VIRTUAL_VALUE)
            new_assign = jnp.where(unhappy | revived, -1, assign)
            return new_assign, jnp.any(new_assign != assign)

        assign2, _ = jax.lax.while_loop(
            lambda s: s[1], settle_body, (assign, jnp.asarray(True)))
        return effective(assign2), assign2, eps_new, it + 1

    def body(state):
        prices, assign, eps_cur, it = state
        unassigned_any = jnp.any((assign == -1) & row_valid)
        return jax.lax.cond(unassigned_any, bid_round, next_phase,
                            prices, assign, eps_cur, it)

    def cond(state):
        _, assign, eps_cur, it = state
        unassigned_any = jnp.any((assign == -1) & row_valid)
        return (unassigned_any | (eps_cur > eps_final)) & (it < max_iters)

    prices0 = jnp.zeros((c,), jnp.float32)
    prices, assign, _, _ = jax.lax.while_loop(
        cond, body, (prices0, unassigned_init, eps0, 0))

    matched = (assign >= 0) & row_valid
    col_match = jnp.where(matched, assign, 0).astype(jnp.int32)
    return col_match, matched
