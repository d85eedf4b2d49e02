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
                                             "interpret", "axis",
                                             "tail_cap"))
def auction_match(pair_scores, n_particles, n_clusters, eps=None,
                  max_iters=2048, escalate_every=256, return_iters=False,
                  use_pallas=None, interpret=False, axis=None,
                  eps_scale=1e-3, tail_cap=256):
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

    ``axis`` (static): name of a ``shard_map`` mesh axis the PARTICLE ROWS
    are partitioned over.  ``pair_scores`` is then the local ``[P/G, C]``
    row block and the returned ``(col_match, matched)`` are local rows too
    (``out_specs=P(axis)`` reassembles the global arrays).  Every
    per-round quantity is row-local except the column-side reductions --
    ``best_bid`` (pmax), ``winner_row`` (pmin) and the unassigned count
    (psum) -- all order-insensitive max/min/int reductions, so the sharded
    trajectory is BIT-IDENTICAL to the replicated one
    (tests/test_auction.py::test_auction_sharded_parity).  Per round that
    is 2 x [C]-vector + 1 scalar collectives (~24 KB at C=3072): at 8
    chips the 38 MB bidding sweep divides by 8 while the collective
    latency adds ~20 us/round -- the measured 223 ms replicated warm-
    flagship matching (benchmarks/phases_r05.log) becomes ~28 ms compute
    + ~13 ms latency.
    """
    p, c = pair_scores.shape
    if axis is not None:
        n_shards = jax.lax.psum(1, axis)
        p_total = p * n_shards
        gids = jax.lax.axis_index(axis) * p + jnp.arange(p)
    else:
        p_total = p
        gids = jnp.arange(p)
    row_valid = gids < n_particles
    col_valid = jnp.arange(c) < n_clusters
    a = jnp.where(row_valid[:, None] & col_valid[None, :],
                  pair_scores.astype(jnp.float32), NEG)

    def _gmax(x):
        return jax.lax.pmax(x, axis) if axis is not None else x

    def _gmin(x):
        return jax.lax.pmin(x, axis) if axis is not None else x

    def _gsum(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    if eps is None:
        # eps = eps_scale x mean positive row-max: the n*eps optimality
        # gap is ~eps_scale of the objective.  1e-3 is the conservative
        # default; 1e-2 is the measured round-count/gap sweet spot on the
        # warm-flagship instance (218 vs 633 rounds at 0.027% vs 0.002%
        # gap -- benchmarks/matching_eps_sweep_r05.json), shipped in the
        # flagship configs as matching_eps_scale.
        row_max = jnp.max(a, axis=1)
        pos = row_max > 0
        eps = eps_scale * _gsum(jnp.sum(jnp.where(pos, row_max, 0.0))) \
            / jnp.maximum(_gsum(jnp.sum(pos)), 1)
        eps = jnp.maximum(eps, 1e-6)

    unassigned_init = jnp.where(row_valid, -1, -2).astype(jnp.int32)
    pallas_top2 = (use_pallas if use_pallas is not None
                   else (interpret or jax.default_backend() == "tpu"))

    def _sweep(a_rows, prices):
        """Per-row (best, argbest, second-best) of ``a_rows - prices``."""
        if pallas_top2:
            # one HBM pass over [rows, C] instead of XLA's 2-3
            from hierarchicalgnn_tpu.ops.pallas.top2 import row_top2
            return row_top2(a_rows, prices, interpret=interpret)
        net = a_rows - prices[None, :]
        v1 = jnp.max(net, axis=1)
        j1 = jnp.argmax(net, axis=1).astype(jnp.int32)
        # second-best via a fused masked reduction (the where re-derives
        # from net inside the same fusion; nothing is written to HBM)
        v2 = jnp.max(jnp.where(
            jnp.arange(c)[None, :] == j1[:, None], NEG, net), axis=1)
        return v1, j1, v2

    def body(state):
        prices, assign, eps_cur, _, it, best_cnt, stuck = state
        # assign: -1 unassigned, -2 virtual, >=0 candidate id
        unassigned = (assign == -1) & row_valid

        # TAIL COMPACTION: the drain profile is a fast bulk then a long
        # small-set price war (the measured warm-flagship instance spends
        # ~190 of 218 rounds on <256 unassigned rows); once the LOCAL
        # unassigned count fits tail_cap, sweep only those rows' gathered
        # [tail_cap, C] block instead of the full [P, C] matrix.  Only
        # unassigned rows ever bid, so the round outcome is BIT-IDENTICAL
        # to the full sweep; rows displaced later re-enter the next
        # round's recomputed set.  The branch decision is per-shard local
        # (no collective; the sweeps themselves contain none).
        n_local_un = jnp.sum(unassigned)

        def full_sweep(_):
            return _sweep(a, prices)

        def tail_sweep(_):
            ids = jnp.sort(jnp.where(unassigned, jnp.arange(p), p))
            ids = jnp.minimum(ids[:tail_cap], p - 1)
            v1s, j1s, v2s = _sweep(a[ids], prices)
            # scatter back; non-set rows get NEG/0 but every consumer is
            # masked by ``unassigned`` (set rows cover all of them)
            v1 = jnp.full((p,), NEG, jnp.float32).at[ids].set(v1s)
            j1 = jnp.zeros((p,), jnp.int32).at[ids].set(j1s)
            v2 = jnp.full((p,), NEG, jnp.float32).at[ids].set(v2s)
            return v1, j1, v2

        if tail_cap and tail_cap < p:
            v1, j1, v2 = jax.lax.cond(n_local_un <= tail_cap,
                                      tail_sweep, full_sweep, None)
        else:
            v1, j1, v2 = full_sweep(None)

        # private virtual escape: no competition, prices never drop, so a
        # virtual-best row retires permanently
        take_virtual = unassigned & (VIRTUAL_VALUE >= v1)
        bid_rows = unassigned & jnp.logical_not(take_virtual)
        bid_amount = (prices[j1] + (v1 - jnp.maximum(v2, VIRTUAL_VALUE))
                      + eps_cur)

        # column auction: highest bid wins; tie-break by row index
        bids = jnp.where(bid_rows, bid_amount, NEG)
        best_bid = _gmax(jax.ops.segment_max(bids, j1, num_segments=c))
        is_best = bid_rows & (bids >= best_bid[j1])
        # unique winner per column: lowest (global) row index among best
        # bidders; a column with no bid reduces to the p_total sentinel
        winner_row = _gmin(jax.ops.segment_min(
            jnp.where(is_best, gids, p_total), j1, num_segments=c))
        won = is_best & (winner_row[j1] == gids)

        # displace previous owners of won columns (the winner's bid IS
        # best_bid, so the price update needs no scatter)
        col_won = winner_row < p_total
        displaced = (assign >= 0) & col_won[jnp.clip(assign, 0, c - 1)]

        new_assign = jnp.where(displaced, -1, assign)
        new_assign = jnp.where(won, j1, new_assign)
        new_assign = jnp.where(take_virtual, -2, new_assign)
        new_prices = jnp.where(col_won, jnp.maximum(prices, best_bid),
                               prices)

        n_unassigned = _gsum(jnp.sum((new_assign == -1) & row_valid))
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
                     jnp.asarray(True), 0, jnp.asarray(p_total, jnp.int32),
                     jnp.asarray(0, jnp.int32)))

    matched = (assign >= 0) & row_valid
    col_match = jnp.where(matched, assign, 0).astype(jnp.int32)
    if return_iters:
        n_unassigned = _gsum(jnp.sum((assign == -1) & row_valid))
        return col_match, matched, it, n_unassigned
    return col_match, matched
