"""Unit tests for the ops layer against dense NumPy / SciPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from hierarchicalgnn_tpu import ops
from hierarchicalgnn_tpu.ops.graph import Graph


def random_masked_edges(rng, n_nodes, n_edges, capacity):
    s = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    r = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    pad = capacity - n_edges
    senders = np.pad(s, (0, pad))
    receivers = np.pad(r, (0, pad))
    mask = np.pad(np.ones(n_edges, bool), (0, pad))
    return senders, receivers, mask


class TestSegment:
    def test_segment_sum_matches_dense(self, rng):
        n, e, cap = 17, 50, 64
        senders, receivers, mask = random_masked_edges(rng, n, e, cap)
        data = rng.normal(size=(cap, 5)).astype(np.float32)
        out = ops.segment_sum(jnp.array(data), jnp.array(receivers), n,
                              mask=jnp.array(mask))
        expected = np.zeros((n, 5), np.float32)
        for i in range(e):
            expected[receivers[i]] += data[i]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_segment_mean_empty_segments_zero(self, rng):
        seg = jnp.array([0, 0, 2], dtype=jnp.int32)
        data = jnp.array([[1.0], [3.0], [5.0]])
        out = ops.segment_mean(data, seg, 4)
        np.testing.assert_allclose(out, [[2.0], [0.0], [5.0], [0.0]])

    def test_segment_min_max_masked(self, rng):
        seg = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
        data = jnp.array([5.0, -2.0, 7.0, 3.0])
        mask = jnp.array([True, True, True, False])
        assert ops.segment_max(data, seg, 3, mask=mask)[0] == 5.0
        assert ops.segment_min(data, seg, 3, mask=mask)[1] == 7.0
        # empty segment produces empty_value
        assert ops.segment_max(data, seg, 3, mask=mask, empty_value=0.0)[2] == 0.0

    def test_gather_segment_sum_weighted(self, rng):
        n_src, n_dst, e = 10, 6, 30
        values = rng.normal(size=(n_src, 4)).astype(np.float32)
        g = rng.integers(0, n_src, e).astype(np.int32)
        s = rng.integers(0, n_dst, e).astype(np.int32)
        w = rng.normal(size=e).astype(np.float32)
        out = ops.gather_segment_sum(jnp.array(values), jnp.array(g),
                                     jnp.array(s), n_dst, weights=jnp.array(w))
        expected = np.zeros((n_dst, 4), np.float32)
        for i in range(e):
            expected[s[i]] += w[i] * values[g[i]]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


class TestGraphOps:
    def test_bidirectionalize(self):
        g = Graph.from_edge_index(np.array([[0, 1], [1, 2]]), capacity=3)
        bi = ops.bidirectionalize(g)
        assert bi.capacity == 6
        assert int(bi.num_edges()) == 4
        np.testing.assert_array_equal(np.asarray(bi.senders)[3:5], [1, 2])

    def test_symmetrize_dedup(self):
        # graph with a duplicate and a mutual pair
        ei = np.array([[0, 1, 0, 2], [1, 0, 1, 3]])
        g = Graph.from_edge_index(ei, capacity=6)
        sym = ops.symmetrize(g)
        pairs = set()
        s, r, m = map(np.asarray, (sym.senders, sym.receivers, sym.edge_mask))
        for i in range(len(m)):
            if m[i]:
                assert (s[i], r[i]) not in pairs
                pairs.add((s[i], r[i]))
        assert pairs == {(0, 1), (1, 0), (2, 3), (3, 2)}

    def test_compact_mask_stable(self):
        mask = jnp.array([False, True, False, True, True])
        perm = ops.compact_mask(mask)
        np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 3, 4])


class TestKNN:
    def test_knn_matches_bruteforce(self, rng):
        pts = rng.normal(size=(40, 3)).astype(np.float32)
        idx, d2 = ops.knn(jnp.array(pts), jnp.array(pts), k=5, r_max=10.0,
                          block_size=16)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        dense = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        for q in range(40):
            # matmul-based distances can swap near-ties with the dense oracle;
            # compare the distance spectrum, not exact index identity.
            expect_d = np.sort(dense[q])[:5]
            np.testing.assert_allclose(np.sort(dense[q][idx[q]]), expect_d,
                                       rtol=1e-3, atol=1e-4)
            assert idx[q][0] == q  # self-match first, distance 0

    def test_knn_radius_filter(self, rng):
        pts = np.array([[0.0], [0.1], [5.0]], np.float32)
        idx, _ = ops.knn(jnp.array(pts), jnp.array(pts), k=3, r_max=1.0)
        idx = np.asarray(idx)
        assert set(idx[0]) == {0, 1, -1}
        assert set(idx[2]) == {2, -1}

    def test_knn_point_mask(self, rng):
        pts = rng.normal(size=(10, 2)).astype(np.float32)
        pmask = np.zeros(10, bool)
        pmask[:3] = True
        idx, _ = ops.knn(jnp.array(pts), jnp.array(pts), k=4, r_max=100.0,
                         p_mask=jnp.array(pmask))
        assert set(np.asarray(idx).ravel()) <= {-1, 0, 1, 2}

    def test_knn_to_edges(self):
        idx = jnp.array([[0, 1, -1], [1, -1, -1]], jnp.int32)
        s, r, m = ops.knn_to_edges(idx)
        np.testing.assert_array_equal(np.asarray(s)[np.asarray(m)], [0, 0, 1])
        np.testing.assert_array_equal(np.asarray(r)[np.asarray(m)], [0, 1, 1])


class TestConnectedComponents:
    def test_cc_chain_and_isolated(self):
        # chain 0-1-2-3, pair 5-6, isolated 4
        ei = np.array([[0, 1, 2, 5], [1, 2, 3, 6]])
        g = Graph.from_edge_index(ei, capacity=8)
        labels = ops.connected_components(g.senders, g.receivers, g.edge_mask, 7)
        labels = np.asarray(labels)
        assert len(set(labels[:4])) == 1
        assert labels[5] == labels[6]
        assert labels[4] not in (labels[0], labels[5])

    def test_cc_against_scipy(self, rng):
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csgraph
        n, e = 60, 80
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
        g = Graph.from_edge_index(np.stack([s, r]), capacity=128)
        labels = np.asarray(ops.connected_components(
            g.senders, g.receivers, g.edge_mask, n))
        adj = sp.coo_matrix((np.ones(e), (s, r)), shape=(n, n))
        _, ref = csgraph.connected_components(adj, directed=False)
        # same partition: labels agree up to renaming
        for a in range(n):
            for b in range(n):
                assert (labels[a] == labels[b]) == (ref[a] == ref[b])

    def test_cluster_labels_min_size(self):
        ei = np.array([[0, 1, 4], [1, 2, 5]])  # sizes 3 and 2; node 3 isolated
        g = Graph.from_edge_index(ei, capacity=4)
        clusters, n_clusters = ops.cluster_labels(
            g.senders, g.receivers, g.edge_mask, 6, min_cluster_size=3)
        clusters = np.asarray(clusters)
        assert int(n_clusters) == 1
        np.testing.assert_array_equal(clusters, [0, 0, 0, -1, -1, -1])


class TestIntersect:
    def test_membership(self, rng):
        truth = np.array([[0, 1, 2], [1, 2, 3]])
        pred = np.array([[0, 2, 3, 1], [1, 3, 0, 2]])
        y = ops.edges_in_set(
            jnp.array(pred[0]), jnp.array(pred[1]),
            jnp.ones(4, bool),
            jnp.array(truth[0]), jnp.array(truth[1]), jnp.ones(3, bool))
        np.testing.assert_array_equal(np.asarray(y), [True, True, False, True])

    def test_membership_with_padding_and_dups(self, rng):
        n = 30
        t = rng.integers(0, n, (2, 40))
        p = rng.integers(0, n, (2, 60))
        tmask = np.pad(np.ones(40, bool), (0, 10))
        pmask = np.pad(np.ones(60, bool), (0, 20))
        tpad = np.pad(t, ((0, 0), (0, 10)))
        ppad = np.pad(p, ((0, 0), (0, 20)))
        y = np.asarray(ops.edges_in_set(
            jnp.array(ppad[0]), jnp.array(ppad[1]), jnp.array(pmask),
            jnp.array(tpad[0]), jnp.array(tpad[1]), jnp.array(tmask)))
        truth_set = {(a, b) for a, b in zip(t[0], t[1])}
        for i in range(60):
            assert y[i] == ((p[0][i], p[1][i]) in truth_set)
        assert not y[60:].any()


class TestGMM:
    def test_em_recovers_mixture(self, rng):
        x = np.concatenate([
            rng.normal(-2.0, 0.5, 4000), rng.normal(3.0, 1.0, 6000)
        ]).astype(np.float32)
        mask = np.ones(len(x), bool)
        gmm = ops.fit_gmm2(jnp.array(x), jnp.array(mask))
        means = np.asarray(gmm.means)
        np.testing.assert_allclose(means, [-2.0, 3.0], atol=0.15)
        np.testing.assert_allclose(np.asarray(gmm.weights), [0.4, 0.6], atol=0.03)

    def test_em_vs_sklearn(self, rng):
        from sklearn.mixture import GaussianMixture
        x = np.concatenate([
            rng.normal(-1.0, 0.3, 2000), rng.normal(1.5, 0.6, 3000)
        ]).astype(np.float32)
        sk = GaussianMixture(n_components=2, random_state=0).fit(x[:, None])
        order = np.argsort(sk.means_.ravel())
        gmm = ops.fit_gmm2(jnp.array(x), jnp.ones(len(x), bool))
        np.testing.assert_allclose(np.asarray(gmm.means),
                                   sk.means_.ravel()[order], atol=0.05)
        np.testing.assert_allclose(np.asarray(gmm.variances),
                                   sk.covariances_.ravel()[order], atol=0.05)

    def test_masked_fit_ignores_padding(self, rng):
        x = np.concatenate([
            rng.normal(-2.0, 0.5, 3000), rng.normal(3.0, 1.0, 3000),
            np.full(2000, 100.0)
        ]).astype(np.float32)
        mask = np.concatenate([np.ones(6000, bool), np.zeros(2000, bool)])
        gmm = ops.fit_gmm2(jnp.array(x), jnp.array(mask))
        np.testing.assert_allclose(np.asarray(gmm.means), [-2.0, 3.0], atol=0.15)

    def test_solve_cut_balanced(self, rng):
        from hierarchicalgnn_tpu.ops.gmm import GMM2, _posterior_balance
        gmm = GMM2(means=jnp.array([-1.0, 2.0]),
                   variances=jnp.array([0.5, 0.5]),
                   weights=jnp.array([0.5, 0.5]))
        cut, valid = ops.solve_cut(gmm, granularity=0.0)
        assert bool(valid)
        # granularity 0 and equal variances/weights -> midpoint
        np.testing.assert_allclose(float(cut), 0.5, atol=1e-3)
        assert abs(float(_posterior_balance(gmm, 0.0, cut))) < 1e-4

    def test_solve_cut_granularity_shifts(self):
        from hierarchicalgnn_tpu.ops.gmm import GMM2
        gmm = GMM2(means=jnp.array([-1.0, 2.0]),
                   variances=jnp.array([0.5, 0.5]),
                   weights=jnp.array([0.5, 0.5]))
        cut_pos, v1 = ops.solve_cut(gmm, granularity=3.0)
        cut_neg, v2 = ops.solve_cut(gmm, granularity=-3.0)
        assert bool(v1) and bool(v2)
        # positive granularity biases toward keeping edges (lower cut... the
        # sigmoid(g) weight on the low posterior pushes the balance point up)
        assert float(cut_pos) > float(cut_neg)


class TestSDDMM:
    def test_edge_dot(self, rng):
        a = rng.normal(size=(6, 4)).astype(np.float32)
        s = np.array([0, 1, 2], np.int32)
        r = np.array([3, 4, 5], np.int32)
        out = ops.edge_dot(jnp.array(a), jnp.array(a), jnp.array(s), jnp.array(r))
        expected = (a[s] * a[r]).sum(-1)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_edge_cosine_likelihood_range(self, rng):
        emb = rng.normal(size=(10, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        s = np.arange(10, dtype=np.int32)
        r = np.roll(s, 1)
        out = np.asarray(ops.edge_cosine_likelihood(
            jnp.array(emb), jnp.array(s), jnp.array(r)))
        assert np.isfinite(out).all()
        cos = (emb[s] * emb[r]).sum(-1)
        np.testing.assert_allclose(out, np.arctanh(np.clip(cos, -1 + 1e-7, 1 - 1e-7)),
                                   rtol=1e-4, atol=1e-5)

    def test_edge_cosine_likelihood_bf16_no_saturation(self):
        """bf16 embeddings must not saturate the likelihood at the atanh
        clamp: a bf16 dot quantizes converged-track cosines (cos > 0.996)
        to exactly 1, pinning the GMM score_cut at atanh(1-clamp) and
        collapsing clustering (the epoch-90 failure of
        runs/bc_pallas_bf16_long).  The op computes its f32 island
        internally, so bf16 inputs at cos=0.999 stay near atanh(0.999)."""
        theta = np.arccos(0.999)
        emb = np.stack([[1.0, 0.0], [np.cos(theta), np.sin(theta)]])
        emb_bf16 = jnp.asarray(emb).astype(jnp.bfloat16)
        s = jnp.array([0], jnp.int32)
        r = jnp.array([1], jnp.int32)
        out = np.asarray(ops.edge_cosine_likelihood(emb_bf16, s, r))
        assert out.dtype == np.float32
        clamp_val = np.arctanh(1 - 1e-7)
        # bf16 input quantization perturbs cos by O(1e-3); the result must
        # stay in the vicinity of atanh(0.999)=3.8, far from the 8.38 clamp
        assert 2.0 < out[0] < 6.0, f"saturated: {out[0]} (clamp {clamp_val})"


class TestTrackingMetrics:
    """Deterministic scenarios for the eval_metrics semantics
    (reference Modules/tracking_utils.py:18-83)."""

    def _event(self):
        # 3 particles x 6 hits + 2 noise hits (pid 0)
        pid = np.repeat([1, 2, 3], 6)
        pid = np.concatenate([pid, [0, 0]])
        pt = np.where(pid > 0, 2.0, 0.0).astype(np.float32)
        return pid, pt

    def test_perfect_reconstruction(self):
        from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics
        pid, pt = self._event()
        hits = np.arange(18)
        tracks = np.repeat([0, 1, 2], 6)
        m = eval_metrics(np.stack([hits, tracks]), pid, pt,
                         pt_cut=1.0, nhits_cut=5)
        assert m["track_eff"] == 1.0
        assert m["track_pur"] == 1.0
        assert m["hit_eff"] == 1.0
        assert m["hit_pur"] == 1.0

    def test_partial_and_noise(self):
        from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics
        pid, pt = self._event()
        # candidate 0: 5 of particle 1's hits + 1 noise hit
        hits = np.concatenate([np.arange(5), [18]])
        tracks = np.zeros(6, np.int64)
        m = eval_metrics(np.stack([hits, tracks]), pid, pt,
                         pt_cut=1.0, nhits_cut=5)
        # particle 1 matched (5/6 hits, majority of candidate), 2 and 3 not
        np.testing.assert_allclose(m["track_eff"], 1 / 3)
        np.testing.assert_allclose(m["hit_pur"], 5 / 6)
        np.testing.assert_allclose(m["hit_eff"], 5 / 6)

    def test_split_track_one_to_one(self):
        from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics
        pid, pt = self._event()
        # particle 1 split into two 3-hit candidates: neither passes the
        # majority-of-nhits cut (3 < 0.5*6 is false... 3 >= 3 passes), the
        # cluster-hash tiebreak must match at most one
        hits = np.arange(6)
        tracks = np.array([0, 0, 0, 1, 1, 1])
        m = eval_metrics(np.stack([hits, tracks]), pid, pt,
                         pt_cut=1.0, nhits_cut=5)
        assert m["track_eff"] <= 1 / 3

    def test_empty_graph(self):
        from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics
        pid, pt = self._event()
        m = eval_metrics(np.zeros((2, 0), np.int64), pid, pt)
        assert m == {"track_eff": 0.0, "track_pur": 0.0,
                     "hit_eff": 0.0, "hit_pur": 0.0}
