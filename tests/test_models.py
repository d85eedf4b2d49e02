"""Forward-pass tests for all five pipeline models on small synthetic events."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.data.event import Event, preprocess_event
from hierarchicalgnn_tpu.data.synthetic import generate_event
from hierarchicalgnn_tpu.models.registry import model_selector

SMALL = {
    "n_nodes_max": 512,
    "n_edges_max": 2048,
    "max_clusters": 128,
    "max_particles": 128,
    "latent": 32,
    "hidden_ratio": 2,
    "n_interaction_graph_iters": 2,
    "n_hierarchical_graph_iters": 2,
    "knn": 10,
    "knn_block_size": 256,
    "gmm_iters": 20,
    "use_pallas": False,  # mode pinned; Pallas variants set it explicitly
    "compute_dtype": "float32",  # dtype pinned; bf16 variants set it explicitly
}


def small_batch(hparams, seed=0, n_particles=30):
    rng = np.random.default_rng(seed)
    raw = generate_event(rng, n_particles=n_particles)
    ev = preprocess_event(raw, hparams)
    return jax.tree.map(jnp.asarray, ev)


@pytest.fixture(scope="module")
def models():
    return {}


def init_model(name):
    hparams, model, pipeline = model_selector(name, SMALL)
    batch = small_batch(hparams)
    variables = model.init(jax.random.key(0), batch.x, batch.graph,
                           node_mask=batch.node_mask, training=False)
    return hparams, model, pipeline, batch, variables


class TestForwards:
    def test_ec_forward(self):
        hparams, model, _, batch, variables = init_model("EC-IN")
        scores = model.apply(variables, batch.x, batch.graph,
                             node_mask=batch.node_mask, training=False)
        scores = np.asarray(scores)
        assert scores.shape == (hparams["n_edges_max"],)
        emask = np.asarray(batch.graph.edge_mask)
        assert ((scores >= 0) & (scores <= 1)).all()
        assert (scores[~emask] == 0).all()
        assert np.isfinite(scores).all()

    def test_embedding_forward_normalized(self):
        hparams, model, _, batch, variables = init_model("Embedding-IN")
        emb = np.asarray(model.apply(variables, batch.x, batch.graph,
                                     node_mask=batch.node_mask, training=False))
        assert emb.shape == (hparams["n_nodes_max"], hparams["emb_dim"])
        norms = np.linalg.norm(emb, axis=1)
        nm = np.asarray(batch.node_mask)
        np.testing.assert_allclose(norms[nm], 1.0, atol=1e-4)

    def test_embedding_hgnn_forward(self):
        hparams, model, _, batch, variables = init_model("Embedding-HGNN-GMM")
        (emb, intermediate, aux), new_vars = model.apply(
            variables, batch.x, batch.graph, node_mask=batch.node_mask,
            training=True, mutable=["buffers", "batch_stats"])
        assert np.isfinite(np.asarray(emb)).all()
        assert int(aux["n_clusters"]) > 3
        clusters = np.asarray(aux["clusters"])
        nm = np.asarray(batch.node_mask)
        assert (clusters[~nm] == -1).all()
        # score_cut buffer became finite after the first training forward
        buffers = new_vars["buffers"]
        leaves = jax.tree.leaves(
            {k: v for k, v in buffers.items()})
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_bc_forward(self):
        hparams, model, _, batch, variables = init_model("BC-HGNN-GMM")
        bgraph, scores, intermediate, aux = model.apply(
            variables, batch.x, batch.graph, node_mask=batch.node_mask,
            training=False)
        scores = np.asarray(scores)
        emask = np.asarray(bgraph.edge_mask)
        assert emask.any()
        assert ((scores >= 0) & (scores <= 1)).all()
        assert (scores[~emask] == 0).all()
        # bipartite receivers point into valid cluster range
        assert (np.asarray(bgraph.receivers)[emask] < int(aux["n_clusters"])).all()

    def test_gmrt_forward(self):
        hparams, model, _, batch, variables = init_model("gMRT")
        bgraph, scores, emb, aux = model.apply(
            variables, batch.x, batch.graph, node_mask=batch.node_mask,
            training=False)
        assert np.isfinite(np.asarray(scores)).all()

    def test_padding_invariance(self):
        """Scores on real edges must not depend on padding capacity."""
        hparams, model, _, _, _ = model_selector("EC-IN", SMALL), None, None, None, None
        hp1, model1, _ = model_selector("EC-IN", SMALL)
        big = dict(SMALL, n_nodes_max=768, n_edges_max=3072)
        hp2, model2, _ = model_selector("EC-IN", big)

        rng = np.random.default_rng(3)
        raw = generate_event(rng, n_particles=30)
        b1 = jax.tree.map(jnp.asarray, preprocess_event(raw, hp1))
        b2 = jax.tree.map(jnp.asarray, preprocess_event(raw, hp2))

        v1 = model1.init(jax.random.key(7), b1.x, b1.graph,
                         node_mask=b1.node_mask, training=False)
        s1 = np.asarray(model1.apply(v1, b1.x, b1.graph,
                                     node_mask=b1.node_mask, training=False))
        s2 = np.asarray(model2.apply(v1, b2.x, b2.graph,
                                     node_mask=b2.node_mask, training=False))
        e = int(np.asarray(b1.graph.edge_mask).sum())
        np.testing.assert_allclose(s1[:e], s2[:e], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["EC-IN", "Embedding-IN",
                                  "Embedding-HGNN-GMM", "BC-HGNN-GMM",
                                  "gMRT"])
def test_bf16_data_path(name):
    """compute_dtype="bfloat16" runs the whole cell data path in bf16
    (residual streams, gathers, aggregations) with f32 heads/losses: loss
    and grads must stay finite and close to the f32 run, and the param
    tree must be identical (checkpoint-compatible)."""
    hparams, model, pipeline = model_selector(name, SMALL)
    batch = small_batch(hparams)
    results = {}
    trees = {}
    for dt in [None, "bfloat16"]:
        hp, m, pl = model_selector(name, dict(SMALL, compute_dtype=dt))
        variables = dict(m.init(jax.random.key(0), batch.x, batch.graph,
                                node_mask=batch.node_mask, training=False))
        params = variables.pop("params")
        trees[str(dt)] = jax.tree.structure(params)

        def loss_fn(p):
            loss, _ = pl.loss(p, variables, batch, 0, training=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn = float(sum(jnp.sum(jnp.square(g))
                       for g in jax.tree.leaves(grads)))
        assert np.isfinite(float(loss)) and np.isfinite(gn)
        results[str(dt)] = float(loss)
    assert trees["None"] == trees["bfloat16"]
    np.testing.assert_allclose(results["bfloat16"], results["None"],
                               rtol=0.05)


def test_emb_head_dtype_ablation_knob():
    """emb_head_dtype="bfloat16" (the seed-study `_r2` ablation variant)
    runs the embedding heads in bf16: embeddings become bf16-quantized
    (round-trip through bf16 is exact) while the shipped default stays
    full-precision f32; loss finite, param tree unchanged."""
    cfg = dict(SMALL, compute_dtype="bfloat16")
    hp, m, pl = model_selector("BC-HGNN-GMM", cfg)
    batch = small_batch(hp)
    embs, trees = {}, {}
    for hd in [None, "bfloat16"]:
        hp2, m2, pl2 = model_selector(
            "BC-HGNN-GMM", dict(cfg, emb_head_dtype=hd))
        variables = dict(m2.init(jax.random.key(0), batch.x, batch.graph,
                                 node_mask=batch.node_mask, training=False))
        params = variables.pop("params")
        trees[str(hd)] = jax.tree.structure(params)
        _, _, intermediate, _ = m2.apply(
            {"params": params, **variables}, batch.x, batch.graph,
            node_mask=batch.node_mask, training=False)
        embs[str(hd)] = np.asarray(intermediate)
        loss, _ = pl2.loss(params, variables, batch, 0, training=False)
        assert np.isfinite(float(loss))
    assert trees["None"] == trees["bfloat16"]
    # the knob must be live: same params/init, different head numerics
    assert not np.allclose(embs["bfloat16"], embs["None"], atol=1e-6)


def test_remat_default_is_dtype_aware():
    """f32 defaults to reference-parity remat=True; bf16 defaults to
    remat=False (measured faster on v5e once activations are half-size);
    an explicit remat override always wins.  The shipped BC config defaults
    to bf16, so the f32 case pins compute_dtype explicitly."""
    hp_f32, _, _ = model_selector(
        "BC-HGNN-GMM", dict(SMALL, compute_dtype="float32"))
    assert hp_f32["remat"] is True
    hp_bf16, _, _ = model_selector(
        "BC-HGNN-GMM", dict(SMALL, compute_dtype="bfloat16"))
    assert hp_bf16["remat"] is False
    hp_expl, _, _ = model_selector(
        "BC-HGNN-GMM", dict(SMALL, compute_dtype="bfloat16", remat=True))
    assert hp_expl["remat"] is True


@pytest.mark.parametrize("variant", [False, "dots"])
def test_remat_toggle_equivalence(variant):
    """remat=False / remat="dots" must keep the param tree, forward, and
    grads identical to the reference-parity remat=True configuration."""
    import dataclasses

    hparams, model, pipeline, batch, variables = init_model("EC-IN")
    cfg_off = dataclasses.replace(model.cfg, remat=variant)
    model_off = type(model)(cfg_off)

    out_on = model.apply(variables, batch.x, batch.graph,
                         node_mask=batch.node_mask, training=False)
    out_off = model_off.apply(variables, batch.x, batch.graph,
                              node_mask=batch.node_mask, training=False)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               atol=1e-6)

    params = variables["params"]

    def loss(p, m):
        scores = m.apply({**variables, "params": p}, batch.x, batch.graph,
                         node_mask=batch.node_mask, training=False)
        return jnp.sum(scores ** 2)

    g_on = jax.grad(loss)(params, model)
    g_off = jax.grad(loss)(params, model_off)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
