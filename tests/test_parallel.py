"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.data.event import preprocess_event
from hierarchicalgnn_tpu.data.synthetic import generate_dataset
from hierarchicalgnn_tpu.models.registry import model_selector
from hierarchicalgnn_tpu.parallel.mesh import make_mesh
from hierarchicalgnn_tpu.parallel.step import make_dp_train_step, stack_events
from hierarchicalgnn_tpu.train.optim import make_optimizer
from hierarchicalgnn_tpu.train.trainer import Trainer

TINY = {
    "n_nodes_max": 256,
    "n_edges_max": 1024,
    "max_clusters": 64,
    "max_particles": 64,
    "latent": 16,
    "hidden_ratio": 2,
    "n_interaction_graph_iters": 1,
    "n_hierarchical_graph_iters": 1,
    "knn": 5,
    "knn_block_size": 128,
    "gmm_iters": 10,
    "train_split": [4, 2, 2],
    "warmup": 2,
    "use_pallas": False,
    "compute_dtype": "float32",  # equivalence tolerances are f32; the
    # shipped yaml default is bf16 and must not leak into oracle tests
}


def test_mesh_creation():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(data=2, graph=4)
    assert mesh.shape == {"data": 2, "graph": 4}


def _run_dp_step(name, data, graph):
    hparams, model, pipeline = model_selector(name, TINY)
    events = generate_dataset(4, seed=3, n_particles=12)
    batch_events = [jax.tree.map(jnp.asarray, preprocess_event(e, hparams))
                    for e in events[:data]]
    # pad batch to the data-axis size
    while len(batch_events) < data:
        batch_events.append(batch_events[-1])
    batch = stack_events(batch_events)

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/dp_test")
    state = trainer.init_state(batch_events[0])
    mesh = make_mesh(data=data, graph=graph)
    optimizer = make_optimizer(hparams, 4)
    step = make_dp_train_step(pipeline, optimizer, mesh)
    new_state, metrics = step(state, batch, 0)
    assert np.isfinite(float(metrics["training_loss"]))
    for leaf in jax.tree.leaves(new_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    return metrics


def test_dp_step_ec():
    _run_dp_step("EC-IN", data=2, graph=4)


def test_dp_step_bc():
    _run_dp_step("BC-HGNN-GMM", data=2, graph=4)


def test_dp_matches_single_device():
    """The sharded step must compute the same loss as an unsharded one."""
    hparams, model, pipeline = model_selector("EC-IN", TINY)
    events = generate_dataset(2, seed=5, n_particles=12)
    evs = [jax.tree.map(jnp.asarray, preprocess_event(e, hparams))
           for e in events]
    batch = stack_events(evs)

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/dp_test2")
    state = trainer.init_state(evs[0])
    optimizer = make_optimizer(hparams, 4)

    mesh = make_mesh(data=2, graph=4)
    step = make_dp_train_step(pipeline, optimizer, mesh)
    state_sharded = jax.tree.map(jnp.copy, state)
    _, m_sharded = step(state_sharded, batch, 0)

    mesh1 = make_mesh(data=1, graph=1)
    step1 = make_dp_train_step(pipeline, optimizer, mesh1)
    state_single = jax.tree.map(jnp.copy, state)
    _, m_single = step1(state_single, batch, 0)

    np.testing.assert_allclose(float(m_sharded["training_loss"]),
                               float(m_single["training_loss"]),
                               rtol=1e-4)


@pytest.mark.parametrize("rdma", [False, True],
                         ids=["all_gather", "rdma_ring"])
def test_halo_partitioned_flat_in_matches_unsharded(rng, rdma):
    """Edge-partitioned shard_map flat-IN == unsharded oracle, through both
    halo backends: XLA all_gather and the Pallas bidirectional-ring RDMA
    collective (interpreted on the CPU mesh)."""
    from hierarchicalgnn_tpu.models.mlp import MLP
    from hierarchicalgnn_tpu.parallel import halo

    n_parts, n_nodes, latent = 4, 64, 16
    n_edges = 200
    x = rng.normal(size=(n_nodes, 3)).astype(np.float32)
    senders = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    receivers = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    mask = np.ones(n_edges, bool)

    mlps = (
        MLP(hidden_size=32, output_size=latent, hidden_layers=2,
            layer_norm=True),
        MLP(hidden_size=32, output_size=latent, hidden_layers=2,
            layer_norm=True),
        MLP(hidden_size=32, output_size=latent, hidden_layers=2,
            layer_norm=True),
        MLP(hidden_size=32, output_size=latent, hidden_layers=2,
            output_activation="Tanh", layer_norm=True),
    )
    key = jax.random.key(0)
    params = {
        "node_enc": mlps[0].init(key, jnp.zeros((1, 3)))["params"],
        "edge_enc": mlps[1].init(key, jnp.zeros((1, 6)))["params"],
        "node_net": mlps[2].init(key, jnp.zeros((1, 2 * latent)))["params"],
        "edge_net": mlps[3].init(key, jnp.zeros((1, 3 * latent)))["params"],
    }

    oracle = halo.flat_in_reference_step(
        params, mlps, jnp.asarray(x), jnp.asarray(senders),
        jnp.asarray(receivers), jnp.asarray(mask), n_nodes, iterations=2)

    s_p, r_p, m_p = halo.partition_edges_by_receiver(
        senders, receivers, mask, n_nodes, n_parts)
    mesh = make_mesh(data=1, graph=n_parts)
    mesh1 = jax.sharding.Mesh(np.asarray(mesh.devices).reshape(-1), ("graph",))
    fwd = halo.make_halo_flat_forward(
        halo.make_halo_flat_in(mlps, iterations=2), mesh1, rdma_gather=rdma)
    # flatten per-device stacks into globally-sharded arrays
    nodes_out = fwd(params, jnp.asarray(x),
                    jnp.asarray(s_p.reshape(-1)),
                    jnp.asarray(r_p.reshape(-1)),
                    jnp.asarray(m_p.reshape(-1)))
    np.testing.assert_allclose(np.asarray(nodes_out), np.asarray(oracle),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("rdma", [True], ids=["rdma_ring"])
def test_halo_gradients_match_unsharded(rng, rdma):
    """Param gradients through the shard_map halo forward == unsharded;
    exercises the RDMA ring collective's custom VJP (psum_scatter).  The
    XLA all_gather halo gradients are covered at production scope by
    tests/test_graph_shard.py."""
    from hierarchicalgnn_tpu.models.mlp import MLP
    from hierarchicalgnn_tpu.parallel import halo

    n_parts, n_nodes, latent = 4, 64, 16
    n_edges = 150
    x = rng.normal(size=(n_nodes, 3)).astype(np.float32)
    senders = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    receivers = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    mask = np.ones(n_edges, bool)

    mlps = tuple(MLP(hidden_size=32, output_size=latent, hidden_layers=2,
                     layer_norm=True) for _ in range(4))
    key = jax.random.key(0)
    params = {
        "node_enc": mlps[0].init(key, jnp.zeros((1, 3)))["params"],
        "edge_enc": mlps[1].init(key, jnp.zeros((1, 6)))["params"],
        "node_net": mlps[2].init(key, jnp.zeros((1, 2 * latent)))["params"],
        "edge_net": mlps[3].init(key, jnp.zeros((1, 3 * latent)))["params"],
    }

    s_p, r_p, m_p = halo.partition_edges_by_receiver(
        senders, receivers, mask, n_nodes, n_parts)
    mesh1 = jax.sharding.Mesh(
        np.asarray(jax.devices()[:n_parts]), ("graph",))
    fwd = halo.make_halo_flat_forward(
        halo.make_halo_flat_in(mlps, iterations=2), mesh1, rdma_gather=rdma)

    def loss_halo(p):
        out = fwd(p, jnp.asarray(x), jnp.asarray(s_p.reshape(-1)),
                  jnp.asarray(r_p.reshape(-1)), jnp.asarray(m_p.reshape(-1)))
        return jnp.sum(out ** 2)

    def loss_ref(p):
        out = halo.flat_in_reference_step(
            p, mlps, jnp.asarray(x), jnp.asarray(senders),
            jnp.asarray(receivers), jnp.asarray(mask), n_nodes, iterations=2)
        return jnp.sum(out ** 2)

    g_halo = jax.grad(loss_halo)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_halo), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_tp_matches_single_device():
    """Tensor-parallel layout (hidden-dim sharded params) must train
    identically to the replicated single-device step: same loss, same
    params after one update."""
    from hierarchicalgnn_tpu.parallel.tp import (
        make_tp_mesh, make_tp_train_step)

    hparams, model, pipeline = model_selector("EC-IN", TINY)
    events = generate_dataset(2, seed=7, n_particles=12)
    evs = [jax.tree.map(jnp.asarray, preprocess_event(e, hparams))
           for e in events]
    batch = stack_events(evs)

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/tp_test")
    state = trainer.init_state(evs[0])
    optimizer = make_optimizer(hparams, 4)

    mesh = make_tp_mesh(data=2, model=4)
    state_tp, step_tp = make_tp_train_step(
        pipeline, optimizer, mesh, jax.tree.map(jnp.copy, state),
        hidden=hparams["hidden"])
    # params with a hidden-sized dim must actually be sharded
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(state_tp.params)
        if not leaf.sharding.is_fully_replicated)
    assert n_sharded > 0, "TP rule sharded no parameters"
    new_tp, m_tp = step_tp(state_tp, batch, 0)

    mesh1 = make_mesh(data=1, graph=1)
    step1 = make_dp_train_step(pipeline, optimizer, mesh1)
    new_1, m_1 = step1(jax.tree.map(jnp.copy, state), batch, 0)

    np.testing.assert_allclose(float(m_tp["training_loss"]),
                               float(m_1["training_loss"]), rtol=1e-4)
    for p_tp, p_1 in zip(jax.tree.leaves(new_tp.params),
                         jax.tree.leaves(new_1.params)):
        np.testing.assert_allclose(np.asarray(p_tp), np.asarray(p_1),
                                   rtol=5e-4, atol=1e-5)
