"""Pallas segment-sum kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.ops.pallas.segment_kernel import (
    csr_segment_sum, make_csr_layout, sorted_segment_sum_auto,
)
from hierarchicalgnn_tpu.ops.segment import segment_sum


def random_problem(rng, n_nodes, n_edges, e_pad, dim):
    receivers = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    mask = np.zeros(e_pad, bool)
    mask[:n_edges] = True
    receivers = np.pad(receivers, (0, e_pad - n_edges))
    data = rng.normal(size=(e_pad, dim)).astype(np.float32)
    return jnp.array(receivers), jnp.array(mask), jnp.array(data)


@pytest.mark.parametrize("n_nodes,n_edges,e_pad,dim", [
    (512, 2000, 2048, 128),
    (300, 1500, 2048, 128),   # num_segments not a block multiple
    (1024, 100, 1024, 256),   # sparse
])
def test_kernel_matches_xla(rng, n_nodes, n_edges, e_pad, dim):
    receivers, mask, data = random_problem(rng, n_nodes, n_edges, e_pad, dim)
    layout = make_csr_layout(receivers, mask, n_nodes, block_r=128,
                             block_e=128)
    assert not bool(layout.overflowed)
    out = csr_segment_sum(data, layout, block_r=128, block_e=128,
                          interpret=True)
    expected = segment_sum(data, receivers, n_nodes, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-4)


def test_kernel_gradient(rng):
    n_nodes, n_edges, e_pad, dim = 256, 800, 1024, 128
    receivers, mask, data = random_problem(rng, n_nodes, n_edges, e_pad, dim)
    layout = make_csr_layout(receivers, mask, n_nodes, block_r=128,
                             block_e=128)

    def f(d):
        out = csr_segment_sum(d, layout, block_r=128, block_e=128,
                              interpret=True)
        return jnp.sum(out ** 2)

    def f_ref(d):
        out = segment_sum(d, receivers, n_nodes, mask=mask)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(data)
    g_ref = jax.grad(f_ref)(data)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_skewed_degrees_overflow_flag(rng):
    # all edges to one node: a single group overflows its chunk budget
    e_pad = 4096
    receivers = jnp.zeros((e_pad,), jnp.int32)
    mask = jnp.ones((e_pad,), bool)
    layout = make_csr_layout(receivers, mask, 512, block_r=128, block_e=128,
                             c_max=2)
    assert bool(layout.overflowed)
    # auto path must still be correct via fallback
    data = jnp.asarray(rng.normal(size=(e_pad, 128)), jnp.float32)
    out = sorted_segment_sum_auto(data, receivers, 512, mask, interpret=True)
    expected = segment_sum(data, receivers, 512, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-3)


def test_auto_api(rng):
    n_nodes, n_edges, e_pad, dim = 384, 1200, 2048, 128
    receivers, mask, data = random_problem(rng, n_nodes, n_edges, e_pad, dim)
    out = sorted_segment_sum_auto(data, receivers, n_nodes, mask,
                                  interpret=True)
    expected = segment_sum(data, receivers, n_nodes, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-4)


def test_model_forward_with_pallas_matches_xla(rng):
    """BC forward with use_pallas=True (interpret) == XLA aggregation path."""
    import jax
    import jax.numpy as jnp
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector

    small = {"compute_dtype": "float32",  # kernel-vs-XLA parity needs f32
             "n_nodes_max": 512, "n_edges_max": 2048, "max_clusters": 128,
             "max_particles": 128, "latent": 128, "hidden_ratio": 1,
             "n_interaction_graph_iters": 1, "n_hierarchical_graph_iters": 1,
             "knn": 5, "knn_block_size": 256, "gmm_iters": 10}
    raw = generate_event(np.random.default_rng(11), n_particles=25)

    hp1, m1, _ = model_selector("BC-HGNN-GMM", dict(small, use_pallas=False))
    hp2, m2, _ = model_selector("BC-HGNN-GMM", dict(small, use_pallas=True))
    b = jax.tree.map(jnp.asarray, preprocess_event(raw, hp1))
    v = m1.init(jax.random.key(0), b.x, b.graph, node_mask=b.node_mask,
                training=False)
    out1 = m1.apply(v, b.x, b.graph, node_mask=b.node_mask, training=False)
    out2 = m2.apply(v, b.x, b.graph, node_mask=b.node_mask, training=False)

    # the sorted-native path returns bipartite edges in receiver-sorted
    # order; compare as (sender, receiver) -> score maps
    def score_map(out):
        bg, scores = out[0], np.asarray(out[1])
        s, r = np.asarray(bg.senders), np.asarray(bg.receivers)
        m = np.asarray(bg.edge_mask)
        return {(int(a), int(b)): scores[i]
                for i, (a, b) in enumerate(zip(s, r)) if m[i]}

    m1_scores, m2_scores = score_map(out1), score_map(out2)
    assert set(m1_scores) == set(m2_scores)
    for k in m1_scores:
        np.testing.assert_allclose(m1_scores[k], m2_scores[k],
                                   rtol=1e-3, atol=1e-4)
