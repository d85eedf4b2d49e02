"""Grid (cell-blocked) kNN vs the brute-force oracle (ops/grid_knn.py).

Reference scope: FRNN's grid-cell kNN at full-event scale
(``/root/reference/Modules/utils.py:228-239``).  Exactness here is not
assumed but certified on device: whenever ``exact`` comes back True the
result must EQUAL brute force; the clustered/uniform clouds below are
sized so the certificate actually fires.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.ops.grid_knn import grid_knn, grid_knn_graph
from hierarchicalgnn_tpu.ops.knn import knn


def _clustered_cloud(rng, n, d, n_clusters=40, spread=0.05):
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, n_clusters, n)] + \
        rng.normal(scale=spread, size=(n, d))
    return pts.astype(np.float32)


def _assert_matches_brute(idx_g, d2_g, idx_b, d2_b, q_valid=None):
    """Same neighbor distances slot-for-slot; same index SETS (ties may
    reorder equal distances between implementations)."""
    d2_g, d2_b = np.asarray(d2_g), np.asarray(d2_b)
    idx_g, idx_b = np.asarray(idx_g), np.asarray(idx_b)
    rows = range(len(d2_g)) if q_valid is None else np.where(q_valid)[0]
    for q in rows:
        np.testing.assert_allclose(d2_g[q], d2_b[q], rtol=1e-4, atol=1e-5,
                                   err_msg=f"query {q}")
        assert set(idx_g[q][idx_g[q] >= 0]) == set(idx_b[q][idx_b[q] >= 0]) \
            or np.allclose(np.sort(d2_g[q]), np.sort(d2_b[q]),
                           rtol=1e-4, atol=1e-5), f"query {q}"


@pytest.mark.parametrize("seed,r_max,n_probe", [(0, 0.4, 12), (1, 2.0, 16)])
def test_grid_matches_brute_clustered(seed, r_max, n_probe):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(_clustered_cloud(rng, 2048, 8))
    idx_b, d2_b = knn(pts, pts, 16, r_max, block_size=512)
    idx_g, d2_g, exact = grid_knn(pts, pts, 16, r_max, n_cells=32,
                                  n_probe=n_probe)
    assert bool(exact), "certificate refused on a benign clustered cloud"
    _assert_matches_brute(idx_g, d2_g, idx_b, d2_b)


def test_grid_matches_brute_uniform_3d():
    """Uniform 3-D positions (the FRNN spatial regime)."""
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-1, 1, (4096, 3)).astype(np.float32))
    idx_b, d2_b = knn(pts, pts, 8, 0.15, block_size=1024)
    idx_g, d2_g, exact = grid_knn(pts, pts, 8, 0.15, n_cells=64, n_probe=32)
    assert bool(exact)
    _assert_matches_brute(idx_g, d2_g, idx_b, d2_b)


def test_grid_masked_and_padded():
    """Query/point masks behave like brute force (-1 slots, inf dists)."""
    rng = np.random.default_rng(3)
    pts = jnp.asarray(_clustered_cloud(rng, 1024, 8))
    mask = jnp.asarray(rng.random(1024) < 0.75)
    idx_b, d2_b = knn(pts, pts, 8, 1.0, q_mask=mask, p_mask=mask,
                      block_size=256)
    idx_g, d2_g, exact = grid_knn(pts, pts, 8, 1.0, q_mask=mask,
                                  p_mask=mask, n_cells=16, n_probe=14)
    assert bool(exact)
    _assert_matches_brute(idx_g, d2_g, idx_b, d2_b, q_valid=np.asarray(mask))
    assert (np.asarray(idx_g)[~np.asarray(mask)] == -1).all()


def test_certificate_refuses_when_underprobed():
    """With 1 probe cell on a spread-out cloud the result cannot be exact
    -- the certificate must say so rather than return a wrong answer
    silently."""
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(1024, 8)).astype(np.float32))
    _, _, exact = grid_knn(pts, pts, 32, 10.0, n_cells=32, n_probe=1)
    assert not bool(exact)


def test_grid_knn_graph_edges_match():
    """COO wrapper: same edge multiset as the brute-force graph."""
    from hierarchicalgnn_tpu.ops.knn import knn_graph

    rng = np.random.default_rng(5)
    pts = jnp.asarray(_clustered_cloud(rng, 512, 8))
    s_b, r_b, m_b, _ = knn_graph(pts, 0.5, 8, block_size=128)
    s_g, r_g, m_g, _, exact = grid_knn_graph(pts, 0.5, 8, n_cells=8,
                                             n_probe=8)
    assert bool(exact)
    got = set(zip(np.asarray(s_g)[np.asarray(m_g)],
                  np.asarray(r_g)[np.asarray(m_g)]))
    want = set(zip(np.asarray(s_b)[np.asarray(m_b)],
                   np.asarray(r_b)[np.asarray(m_b)]))
    assert got == want


def test_traced_radius():
    """r_max as a traced scalar (the adaptive knn_radius buffer)."""
    rng = np.random.default_rng(9)
    pts = jnp.asarray(_clustered_cloud(rng, 512, 8))

    @jax.jit
    def run(r):
        return grid_knn(pts, pts, 8, r, n_cells=8, n_probe=8)

    idx, d2, exact = run(jnp.float32(0.3))
    idx_b, d2_b = knn(pts, pts, 8, 0.3, block_size=128)
    assert bool(exact)
    _assert_matches_brute(idx, d2, idx_b, d2_b)


def test_embedding_pipeline_grid_backend():
    """knn_backend=grid drives Embedding-IN mining end-to-end; the
    certificate surfaces as the knn_exact metric."""
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.trainer import Trainer

    overrides = {
        "n_nodes_max": 256, "n_edges_max": 1024, "max_particles": 64,
        "latent": 16, "hidden_ratio": 2, "n_interaction_graph_iters": 2,
        "knn": 8, "knn_block_size": 128, "train_split": [2, 1, 1],
        "warmup": 2, "use_pallas": False, "compute_dtype": "float32",
        "knn_backend": "grid", "knn_grid_cells": 16, "knn_grid_probe": 12,
    }
    hparams, model, pipeline = model_selector("Embedding-IN", overrides)
    raw = generate_event(np.random.default_rng(2), n_particles=20)
    ev = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/grid_pipe")
    state = trainer.init_state(ev)
    loss, (_, metrics) = pipeline.loss(state.params, state.buffers, ev, 0,
                                       training=True)
    assert np.isfinite(float(loss))
    assert "knn_exact" in metrics
