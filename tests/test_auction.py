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


@pytest.mark.slow
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
        jnp.asarray(scores), p, c, return_iters=True)  # shipped defaults
    col_match, matched = np.asarray(col_match), np.asarray(matched)

    _, oracle_total = scipy_oracle(scores, p, c)
    ours_total = sum(scores[i, col_match[i]] for i in range(p) if matched[i])
    used = col_match[:p][matched[:p]]
    assert len(used) == len(set(used.tolist()))
    assert int(n_unassigned) == 0 and int(iters) < 2048
    # all c candidates are contested by ~24 rows each: every candidate must
    # be filled (len(used) == c), with at most a ~0.1%-scale objective gap
    # (the adaptive-eps complementary-slackness bound)
    assert len(used) == c
    assert ours_total >= oracle_total * (1 - 5e-3) - 1e-6, (
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


@pytest.mark.slow
def test_auction_pallas_flagship_shape(rng):
    """Pallas one-pass round at the WARM FLAGSHIP instance shape
    [3001 x 2426] (the real BC matrix shape from scripts/dump_warm_scores.py,
    reference ``bipartite_classification_base.py:152-191``): parity with the
    XLA round on a near-tie contested instance, plus round-count and
    feasibility assertions.  Interpret mode (CPU); the toy-scale parity test
    above leaves the [P, C] blocked grid path otherwise unexercised."""
    p, c = 3001, 2426
    p_max, c_max = 3008, 2432          # lane-aligned padded capacities
    scores = np.zeros((p_max, c_max), np.float32)
    # warm-training regime: every particle scores on ~6 candidates drawn
    # from a CONTESTED pool (c//2 columns for 3001 rows -> real price wars),
    # near-ties at the 1e-3 scale on O(1) scores
    pool = c // 2
    cols = rng.integers(0, pool, (p, 6))
    vals = (2.0 + rng.uniform(-0.5, 0.5, (p, 6)) * 1e-3).astype(np.float32)
    scores[np.repeat(np.arange(p), 6), cols.reshape(-1)] = vals.reshape(-1)
    s = jnp.asarray(scores)

    cm_a, mt_a, it_a, un_a = auction_match(
        s, p, c, return_iters=True, use_pallas=True, interpret=True)
    cm_b, mt_b, it_b, un_b = auction_match(
        s, p, c, return_iters=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(cm_a), np.asarray(cm_b))
    np.testing.assert_array_equal(np.asarray(mt_a), np.asarray(mt_b))
    assert int(it_a) == int(it_b) < 2048
    assert int(un_a) == 0
    # feasibility at scale: no column double-assigned, all ids in range
    cm, mt = np.asarray(cm_a), np.asarray(mt_a)
    used = cm[:p][mt[:p]]
    assert len(used) == len(set(used.tolist())) and (used < c).all()
    # the contested pool (pool columns, 3001 bidders) must fill completely
    assert len(used) == pool


@pytest.mark.slow
def test_auction_truth_quality_across_training(rng):
    """Auction-vs-scipy TRUTH quality across training stages (VERDICT r1
    item 6): train a tiny BC model, and at early/mid/late checkpoints
    compare the on-device auction matching against the scipy exact matching
    on the real pair-score matrices the loss sees (reference
    ``bipartite_classification_base.py:152-191``).  Asserts the matching
    objective gap < 0.1% and reports/bounds the truth-label flip fraction.
    """
    import jax
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_dataset
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.matching import match_particles_to_candidates
    from hierarchicalgnn_tpu.train.optim import make_optimizer
    from hierarchicalgnn_tpu.train.pipelines import MUTABLE
    from hierarchicalgnn_tpu.train.trainer import Trainer

    TINY = {"n_nodes_max": 256, "n_edges_max": 1024, "max_clusters": 64,
            "max_particles": 64, "latent": 16, "hidden_ratio": 2,
            "n_interaction_graph_iters": 1, "n_hierarchical_graph_iters": 1,
            "knn": 5, "knn_block_size": 128, "gmm_iters": 10,
            "train_split": [3, 1, 1], "warmup": 2, "emb_epoch": 8,
            "use_pallas": False, "compute_dtype": "float32"}
    hparams, model, pipeline = model_selector("BC-HGNN-GMM", TINY)
    events = generate_dataset(3, seed=9, n_particles=15)
    evs = [jax.tree.map(jnp.asarray, preprocess_event(e, hparams))
           for e in events]
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/auction_tq")
    state = trainer.init_state(evs[0])
    optimizer = trainer.optimizer

    @jax.jit
    def train_step(state, batch, epoch):
        def loss_fn(params):
            loss, (nb, m) = pipeline.loss(params, state.buffers, batch,
                                          epoch, training=True)
            return loss, nb

        (_, nb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(params=new_params, buffers=nb,
                             opt_state=new_opt, step=state.step + 1)

    def compare(state, batch, stage):
        variables = {"params": state.params, **state.buffers}
        bgraph, scores, _, aux = model.apply(
            variables, batch.x, batch.graph, node_mask=batch.node_mask,
            training=False)
        args = (jnp.asarray(scores), bgraph.senders, bgraph.receivers,
                bgraph.edge_mask, batch.pid_compact, batch.particle_pid,
                batch.n_particles, aux["n_clusters"],
                hparams["max_clusters"])
        # eps_scale as shipped in the config under test (the flagship
        # YAML ships the 1e-2 round-count/gap sweet spot)
        t_auc, r_a, c_a, v_a = match_particles_to_candidates(
            *args, backend="auction",
            eps_scale=float(hparams.get("matching_eps_scale", 1e-3)))
        t_sci, r_s, c_s, v_s = match_particles_to_candidates(
            *args, backend="host")

        # objective on the same accumulated pair-score matrix
        from hierarchicalgnn_tpu.ops.segment import segment_sum
        p_max, c_max = hparams["max_particles"], hparams["max_clusters"]
        part = batch.pid_compact[bgraph.senders]
        flat = part * c_max + bgraph.receivers
        pair = np.asarray(segment_sum(
            jnp.where(bgraph.edge_mask, scores, 0.0), flat,
            p_max * c_max).reshape(p_max, c_max))

        def objective(rows, cols, valid):
            rows, cols, valid = map(np.asarray, (rows, cols, valid))
            return pair[rows[valid], cols[valid]].sum()

        obj_a, obj_s = objective(r_a, c_a, v_a), objective(r_s, c_s, v_s)
        assert obj_a >= obj_s * (1 - 1e-3) - 1e-9, (stage, obj_a, obj_s)

        emask = np.asarray(bgraph.edge_mask)
        flips = (np.asarray(t_auc) != np.asarray(t_sci)) & emask
        flip_frac = flips.sum() / max(emask.sum(), 1)
        print(f"[auction-tq] {stage}: objective auction={obj_a:.6f} "
              f"scipy={obj_s:.6f} truth-flip={flip_frac:.4f}")
        # Label flips on tie-degenerate matrices are solver-choice noise
        # (two EXACT solvers can disagree the same way when assignments of
        # equal weight exist); the objective gap above is the quality
        # assertion, the flip fraction is reported and loosely bounded.
        assert flip_frac < 0.15, (stage, flip_frac)

    stages = {0: "early", 5: "mid", 14: "late"}
    epoch_count = 15
    for epoch in range(epoch_count):
        if epoch in stages:
            compare(state, evs[0], stages[epoch])
        for batch in evs:
            state = train_step(state, batch, epoch)
    compare(state, evs[0], "final")


def test_auction_sharded_parity(rng):
    """Row-sharded auction (shard_map over the graph axis) is BIT-identical
    to the replicated auction: every cross-shard reduction in the round is
    a max/min/int-sum (train/auction.py ``axis``), so the price/assignment
    trajectory cannot diverge."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from hierarchicalgnn_tpu.parallel.mesh import make_mesh

    p_max, c_max = 256, 96
    p, c = 241, 77
    scores = np.zeros((p_max, c_max), np.float32)
    m = rng.random((p, c)) < 0.15
    scores[:p, :c][m] = rng.uniform(0.1, 5.0, m.sum()).astype(np.float32)
    # near-tie block: forces multi-round price wars (and escalation
    # bookkeeping) through the sharded reductions
    scores[:40, :5] = 3.0 + rng.uniform(0, 1e-3, (40, 5)).astype(np.float32)

    ref_cm, ref_ok = auction_match(jnp.asarray(scores), p, c)

    mesh = make_mesh(data=1, graph=8)
    f = shard_map(functools.partial(auction_match, axis="graph"),
                  mesh=mesh, in_specs=(P("graph"), P(), P()),
                  out_specs=(P("graph"), P("graph")), check_vma=False)
    cm, ok = f(jnp.asarray(scores), jnp.int32(p), jnp.int32(c))

    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref_cm))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref_ok))


def test_matching_sharded_in_loss_path(rng):
    """match_particles_to_candidates with mesh/axis set returns exactly the
    replicated result (the seam the sharded train step uses)."""
    from hierarchicalgnn_tpu.parallel.mesh import make_mesh
    from hierarchicalgnn_tpu.train.matching import (
        match_particles_to_candidates)

    p_max, c_max = 64, 32
    n_hits, n_edges = 128, 256
    senders = rng.integers(0, n_hits, n_edges).astype(np.int32)
    receivers = rng.integers(0, c_max, n_edges).astype(np.int32)
    emask = rng.random(n_edges) < 0.9
    # dyadic scores: per-(row, col) sums are EXACT in f32, so the sharded
    # path's different summation order (per-shard scatter + psum_scatter)
    # cannot perturb the pair matrix and bit-parity is assertable
    scores = (rng.integers(1, 256, n_edges) / 256.0).astype(np.float32)
    pid_compact = rng.integers(0, p_max, n_hits).astype(np.int32)
    particle_pid = rng.integers(1, 10_000, p_max).astype(np.int64)

    args = (jnp.asarray(scores), jnp.asarray(senders),
            jnp.asarray(receivers), jnp.asarray(emask),
            jnp.asarray(pid_compact), jnp.asarray(particle_pid),
            jnp.int32(50), jnp.int32(25), c_max)
    ref = match_particles_to_candidates(*args)
    mesh = make_mesh(data=1, graph=8)
    out = match_particles_to_candidates(*args, mesh=mesh, axis="graph")
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auction_tail_compaction_parity(rng):
    """tail_cap sweeps only the gathered unassigned rows once the count
    drains below the cap -- the trajectory must stay BIT-identical to the
    full sweep (only unassigned rows ever bid)."""
    p_max, c_max = 512, 160
    p, c = 490, 150
    scores = np.zeros((p_max, c_max), np.float32)
    m = rng.random((p, c)) < 0.08
    scores[:p, :c][m] = rng.uniform(0.1, 5.0, m.sum()).astype(np.float32)
    # near-tie war pocket to keep a small set fighting well past the
    # bulk drain (the tail-mode regime)
    scores[:30, :4] = 2.0 + rng.uniform(0, 1e-3, (30, 4)).astype(np.float32)

    cm_full, ok_full = auction_match(jnp.asarray(scores), p, c, tail_cap=0)
    cm_tail, ok_tail = auction_match(jnp.asarray(scores), p, c, tail_cap=64)
    np.testing.assert_array_equal(np.asarray(cm_full), np.asarray(cm_tail))
    np.testing.assert_array_equal(np.asarray(ok_full), np.asarray(ok_tail))


def test_auction_sharded_tail_parity(rng):
    """Sharded mode + tail compaction together: the tail branch decision
    is per-shard LOCAL (no collective), and the result must still equal
    the replicated full-sweep auction bit-for-bit."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from hierarchicalgnn_tpu.parallel.mesh import make_mesh

    p_max, c_max = 256, 96
    p, c = 230, 80
    scores = np.zeros((p_max, c_max), np.float32)
    m = rng.random((p, c)) < 0.2
    scores[:p, :c][m] = rng.uniform(0.1, 5.0, m.sum()).astype(np.float32)
    scores[:24, :3] = 3.0 + rng.uniform(0, 1e-3, (24, 3)).astype(np.float32)

    ref_cm, ref_ok = auction_match(jnp.asarray(scores), p, c, tail_cap=0)

    mesh = make_mesh(data=1, graph=8)
    f = shard_map(functools.partial(auction_match, axis="graph",
                                    tail_cap=8),
                  mesh=mesh, in_specs=(P("graph"), P(), P()),
                  out_specs=(P("graph"), P("graph")), check_vma=False)
    cm, ok = f(jnp.asarray(scores), jnp.int32(p), jnp.int32(c))
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref_cm))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref_ok))
