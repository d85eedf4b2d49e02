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

Two mechanisms keep the optimality gap small AND the rounds bounded:

* **Data-scaled eps** (``eps=None`` default): the bid increment is
  ``1e-3 x mean positive row-max``, so the textbook ``n*eps``
  complementary-slackness gap is ~0.1% of the objective whatever the
  score magnitude.  A fixed eps is either sloppy (scores tiny) or slow
  (scores large): on a real warm instance (P=3001, C=2426, scores to 41)
  fixed eps=1e-4 needed 4466 rounds and a 256-round cap left 24 rows
  unmatched.

* **Progress-aware eps-escalation**: eps doubles only after
  ``escalate_every`` consecutive rounds in which the unassigned-row count
  made no new low -- a pure war-breaker of last resort.  Eager time-based
  escalation (doubling every 16 rounds regardless of progress) was
  measured to inflate the gap to 0.9-1.4% on small late-training
  instances where the endgame is one long price war; with patience 256
  the measured gaps are 0.000% (tiny late-training matrix), 0.002%
  (warm flagship, 633 rounds), 0.044% (adversarial near-tie 200x150).
  Downward eps-*scaling* (Bertsekas' classic scheme) is counterproductive
  here: the private fixed-price virtual escape anchors prices absolutely,
  so coarse phases strand overpriced columns and the repair machinery
  burns the round budget re-fighting fine-eps wars.

``escalate_every=0`` disables escalation and recovers the textbook
n*eps optimality bound; tests use it to pin the exact-mode guarantee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VIRTUAL_VALUE = 1e-12
NEG = -1e30


@functools.partial(jax.jit, static_argnames=("max_iters", "escalate_every",
                                             "return_iters", "use_pallas",
                                             "interpret"))
def auction_match(pair_scores, n_particles, n_clusters, eps=None,
                  max_iters=2048, escalate_every=256, return_iters=False,
                  use_pallas=None, interpret=False):
    """Maximum-weight matching of particles to candidates.

    pair_scores: [P, C] dense accumulated scores (padded entries ignored).
    Returns (col_match int32[P], matched bool[P]): ``matched`` is False for
    padded rows and rows that took their virtual escape.

    ``eps=None`` (default) scales the bid increment to the data:
    ``1e-3 * mean positive row-max``, which bounds the pre-escalation
    optimality gap at ~0.1% of the objective (n*eps complementary
    slackness) regardless of the score magnitude -- a fixed eps is either
    sloppy (scores tiny) or slow (scores large).  Measured on the warm
    flagship instance (P=3001, C=2426, scores to 41): 0.002-0.010% gap vs
    the scipy exact optimum.

    Best/second-best per row come from fused max reductions over
    ``a - prices`` (no materialized [P, C] temporaries -- ``lax.top_k`` and
    scatter-``.set`` row-masking both cost several extra HBM passes), and
    the loop is a ``while_loop`` with a hard round cap -- typical instances
    exit in a handful of rounds.  Rows whose only alternative is the
    virtual escape bid their full value, so single-column pile-ups (the
    early-training regime with one cluster and thousands of particles)
    resolve in one round.  Near-tie wars between real columns are ended by
    doubling eps, but escalation is PROGRESS-AWARE: eps doubles only after
    ``escalate_every`` consecutive rounds in which the unassigned-row count
    made no new low (0 = never escalate) -- while rows keep draining, the
    tight eps (and its gap bound) is preserved; only genuine price wars pay
    the escalation slack.  Rows still unassigned at the cap take the
    conservative unmatched label.
    """
    p, c = pair_scores.shape
    row_valid = jnp.arange(p) < n_particles
    col_valid = jnp.arange(c) < n_clusters
    a = jnp.where(row_valid[:, None] & col_valid[None, :],
                  pair_scores.astype(jnp.float32), NEG)

    if eps is None:
        row_max = jnp.max(a, axis=1)
        pos = row_max > 0
        eps = 1e-3 * jnp.sum(jnp.where(pos, row_max, 0.0)) \
            / jnp.maximum(jnp.sum(pos), 1)
        eps = jnp.maximum(eps, 1e-6)

    unassigned_init = jnp.where(row_valid, -1, -2).astype(jnp.int32)
    pallas_top2 = (use_pallas if use_pallas is not None
                   else (interpret or jax.default_backend() == "tpu"))

    def body(state):
        prices, assign, eps_cur, _, it, best_cnt, stuck = state
        # assign: -1 unassigned, -2 virtual, >=0 candidate id
        unassigned = (assign == -1) & row_valid

        if pallas_top2:
            # one HBM pass over [P, C] instead of XLA's 2-3
            from hierarchicalgnn_tpu.ops.pallas.top2 import row_top2
            v1, j1, v2 = row_top2(a, prices, interpret=interpret)
        else:
            net = a - prices[None, :]
            v1 = jnp.max(net, axis=1)
            j1 = jnp.argmax(net, axis=1).astype(jnp.int32)
            # second-best via a fused masked reduction (the where
            # re-derives from net inside the same fusion; nothing is
            # written back to HBM)
            v2 = jnp.max(jnp.where(
                jnp.arange(c)[None, :] == j1[:, None], NEG, net), axis=1)

        # private virtual escape: no competition, prices never drop, so a
        # virtual-best row retires permanently
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

        n_unassigned = jnp.sum((new_assign == -1) & row_valid)
        if escalate_every:
            improved = n_unassigned < best_cnt
            stuck = jnp.where(improved, 0, stuck + 1)
            best_cnt = jnp.minimum(best_cnt, n_unassigned)
            escalate = stuck >= escalate_every
            eps_cur = jnp.where(escalate, eps_cur * 2.0, eps_cur)
            stuck = jnp.where(escalate, 0, stuck)
        still = n_unassigned > 0
        return new_prices, new_assign, eps_cur, still, it + 1, best_cnt, stuck

    def cond(state):
        _, _, _, active, it, _, _ = state
        return active & (it < max_iters)

    prices0 = jnp.zeros((c,), jnp.float32)
    prices, assign, _, _, it, _, _ = jax.lax.while_loop(
        cond, body, (prices0, unassigned_init, jnp.asarray(eps, jnp.float32),
                     jnp.asarray(True), 0, jnp.asarray(p, jnp.int32),
                     jnp.asarray(0, jnp.int32)))

    matched = (assign >= 0) & row_valid
    col_match = jnp.where(matched, assign, 0).astype(jnp.int32)
    if return_iters:
        n_unassigned = jnp.sum((assign == -1) & row_valid)
        return col_match, matched, it, n_unassigned
    return col_match, matched
