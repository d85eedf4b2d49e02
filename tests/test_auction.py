"""Auction matching vs the scipy exact-matching oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from hierarchicalgnn_tpu.train.auction import auction_match


def scipy_oracle(pair_scores, n_particles, n_clusters):
    """Reference-style matching: scipy with per-row virtual candidates."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    dense = pair_scores[:n_particles, :n_clusters]
    rows, cols = np.nonzero(dense)
    data = dense[rows, cols].astype(np.float64)
    p = n_particles
    vrows = np.arange(p)
    vcols = n_clusters + np.arange(p)
    mat = csr_matrix(
        (np.concatenate([data, np.full(p, 1e-12)]),
         (np.concatenate([rows, vrows]), np.concatenate([cols, vcols]))),
        shape=(p, n_clusters + p))
    r, c = min_weight_full_bipartite_matching(mat, maximize=True)
    assign = {int(a): int(b) for a, b in zip(r, c) if b < n_clusters}
    total = sum(dense[a, b] for a, b in assign.items())
    return assign, total


@pytest.mark.parametrize("p,c,density", [(20, 15, 0.3), (50, 60, 0.1),
                                         (8, 3, 0.8), (100, 100, 0.05)])
def test_auction_matches_scipy_objective(rng, p, c, density):
    p_max, c_max = p + 7, c + 9
    scores = np.zeros((p_max, c_max), np.float32)
    m = rng.random((p, c)) < density
    scores[:p, :c][m] = rng.uniform(0.1, 5.0, m.sum())

    # escalate_every=0: exact mode, pins the textbook n*eps bound
    col_match, matched = auction_match(jnp.asarray(scores), p, c,
                                       eps=1e-5, max_iters=2048,
                                       escalate_every=0)
    col_match, matched = np.asarray(col_match), np.asarray(matched)

    _, oracle_total = scipy_oracle(scores, p, c)
    ours_total = sum(scores[i, col_match[i]] for i in range(p) if matched[i])

    # each candidate matched at most once
    used = col_match[matched[:p].nonzero()[0][:p]]
    used = col_match[:p][matched[:p]]
    assert len(used) == len(set(used.tolist()))
    assert (used < c).all()
    # eps-optimal: objective within eps * P of the exact optimum
    assert ours_total >= oracle_total - 1e-5 * p - 1e-6, (
        ours_total, oracle_total)


def test_auction_empty_and_padded(rng):
    scores = np.zeros((16, 8), np.float32)
    col_match, matched = auction_match(jnp.asarray(scores), 5, 3)
    assert not np.asarray(matched)[5:].any()  # padded rows never matched


def test_auction_in_bc_pipeline_on_device(rng):
    """BC loss computes with the auction backend (no host callback)."""
    import jax
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector

    tiny = {"n_nodes_max": 256, "n_edges_max": 1024, "max_clusters": 64,
            "max_particles": 64, "latent": 16, "n_interaction_graph_iters": 1,
            "n_hierarchical_graph_iters": 1, "knn_block_size": 128,
            "gmm_iters": 10, "matching_backend": "auction"}
    hp, model, pipeline = model_selector("BC-HGNN-GMM", tiny)
    raw = generate_event(np.random.default_rng(2), n_particles=12)
    batch = jax.tree.map(jnp.asarray, preprocess_event(raw, hp))
    variables = model.init(jax.random.key(0), batch.x, batch.graph,
                           node_mask=batch.node_mask, training=False)
    loss, (_, metrics) = jax.jit(
        lambda p, b: pipeline.loss(p, {k: v for k, v in variables.items()
                                       if k != "params"}, b, 0,
                                   training=False)
    )(variables["params"], batch)
    assert np.isfinite(float(loss))


def test_auction_near_tie_war_converges_within_cap(rng):
    """Near-tie score wars (the warm-training regime) must resolve within
    the shipped round cap.  At fixed eps a tie war burns the budget in
    eps-granular bids and the cap leaves rows unmatched; the shipped
    eps-escalation ends the war with every column filled and a tie-scale
    objective gap."""
    p, c = 96, 24
    p_max, c_max = p + 5, c + 3
    scores = np.zeros((p_max, c_max), np.float32)
    # every particle scores ~2.0 on 6 random candidates, ties broken at 1e-3
    tie = 1e-3
    for i in range(p):
        cols = rng.choice(c, size=6, replace=False)
        scores[i, cols] = 2.0 + rng.uniform(-0.5, 0.5, 6) * tie

    col_match, matched, iters, n_unassigned = auction_match(
        jnp.asarray(scores), p, c, eps=1e-4, max_iters=256,
        return_iters=True)
    col_match, matched = np.asarray(col_match), np.asarray(matched)

    _, oracle_total = scipy_oracle(scores, p, c)
    ours_total = sum(scores[i, col_match[i]] for i in range(p) if matched[i])
    used = col_match[:p][matched[:p]]
    assert len(used) == len(set(used.tolist()))
    assert int(n_unassigned) == 0 and int(iters) < 256
    # all c candidates are contested by ~24 rows each: every candidate must
    # be filled (len(used) == c), losing at most the tie spread per column
    assert len(used) == c
    assert ours_total >= oracle_total - c * tie - 1e-6, (
        ours_total, oracle_total)


def test_row_top2_kernel_matches_xla(rng):
    """Pallas one-pass (v1, j1, v2) == XLA max/argmax/masked-remax,
    including tie handling, odd shapes, and all-NEG rows."""
    from hierarchicalgnn_tpu.ops.pallas.top2 import NEG, row_top2

    for p, c in [(64, 96), (300, 700), (256, 512)]:
        a = rng.normal(size=(p, c)).astype(np.float32)
        a[rng.random((p, c)) < 0.3] = NEG          # sparse / masked slots
        a[0] = NEG                                  # fully masked row
        a[1, 5] = a[1, 17] = 3.0                    # exact tie
        prices = np.abs(rng.normal(size=(c,))).astype(np.float32)

        v1, j1, v2 = row_top2(jnp.asarray(a), jnp.asarray(prices),
                              interpret=True)
        net = a - prices[None, :]
        ref_v1 = net.max(1)
        ref_j1 = net.argmax(1)
        ref_v2 = np.where(np.arange(c)[None, :] == ref_j1[:, None],
                          -np.inf, net).max(1)
        np.testing.assert_allclose(np.asarray(v1), ref_v1, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(j1), ref_j1)
        np.testing.assert_allclose(np.asarray(v2), np.maximum(ref_v2, NEG),
                                   rtol=1e-6, atol=1e30 * 1e-6)


def test_auction_pallas_matches_plain(rng):
    """auction_match with the Pallas top-2 round == the XLA round."""
    p, c = 40, 30
    scores = np.zeros((p + 3, c + 2), np.float32)
    m = rng.random((p, c)) < 0.2
    scores[:p, :c][m] = rng.uniform(0.1, 5.0, m.sum())
    s = jnp.asarray(scores)

    cm_a, mt_a = auction_match(s, p, c, use_pallas=True, interpret=True)
    cm_b, mt_b = auction_match(s, p, c, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(cm_a), np.asarray(cm_b))
    np.testing.assert_array_equal(np.asarray(mt_a), np.asarray(mt_b))
