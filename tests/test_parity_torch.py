"""Numerical parity vs a torch oracle implementing the reference math.

The reference models are torch modules (``Modules/gnn_utils.py``,
``Modules/utils.py:169-196``); these tests rebuild the same math in torch
(CPU) as an oracle, copy weights into our flax modules, and require
per-layer activation agreement -- the "allclose parity" acceptance bar.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.models.mlp import MLP
from hierarchicalgnn_tpu.models.cells import InteractionGNNCell
from hierarchicalgnn_tpu.ops.graph import Graph
from hierarchicalgnn_tpu.utils.config import ArchConfig

torch.manual_seed(0)


def torch_mlp(input_size, hidden, output, layers, hidden_act, output_act,
              layer_norm):
    """Oracle mirroring reference make_mlp (utils.py:169-196)."""
    acts = {"GELU": tnn.GELU, "Tanh": tnn.Tanh, None: None}
    seq = []
    sizes = [input_size] + [hidden] * (layers - 1) + [output]
    for i in range(layers - 1):
        seq.append(tnn.Linear(sizes[i], sizes[i + 1]))
        if layer_norm:
            seq.append(tnn.LayerNorm(sizes[i + 1]))
        seq.append(acts[hidden_act]())
    seq.append(tnn.Linear(sizes[-2], sizes[-1]))
    if output_act is not None:
        if layer_norm:
            seq.append(tnn.LayerNorm(sizes[-1]))
        seq.append(acts[output_act]())
    return tnn.Sequential(*seq)


def copy_mlp_params(tmlp, flax_params):
    """Copy torch Sequential Linear/LayerNorm weights into our MLP params."""
    out = {}
    linear_i = 0
    ln_i = 0
    for layer in tmlp:
        if isinstance(layer, tnn.Linear):
            out[f"Dense_{linear_i}"] = {
                "kernel": jnp.asarray(layer.weight.detach().numpy().T),
                "bias": jnp.asarray(layer.bias.detach().numpy()),
            }
            linear_i += 1
        elif isinstance(layer, tnn.LayerNorm):
            out[f"LayerNorm_{ln_i}"] = {
                "scale": jnp.asarray(layer.weight.detach().numpy()),
                "bias": jnp.asarray(layer.bias.detach().numpy()),
            }
            ln_i += 1
    assert set(out) == set(flax_params), (set(out), set(flax_params))
    return out


@pytest.mark.parametrize("layers,hidden_act,output_act,ln", [
    (3, "GELU", "GELU", True),
    (2, "GELU", "Tanh", True),
    (3, "GELU", None, False),
    (1, "GELU", None, True),
])
def test_mlp_parity(rng, layers, hidden_act, output_act, ln):
    tmlp = torch_mlp(12, 32, 16, layers, hidden_act, output_act, ln)
    x = rng.normal(size=(40, 12)).astype(np.float32)

    model = MLP(hidden_size=32, output_size=16, hidden_layers=layers,
                hidden_activation=hidden_act, output_activation=output_act,
                layer_norm=ln)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = copy_mlp_params(tmlp, params)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    theirs = tmlp(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_interaction_cell_parity(rng):
    """One flat IN iteration vs the reference update equations
    (gnn_utils.py:45-71): scatter_add agg, node MLP + residual, edge MLP on
    [src,dst,edge] + residual."""
    latent, hidden = 16, 32
    n, e = 30, 80
    cfg = ArchConfig(latent=latent, hidden=hidden, nb_node_layer=2,
                     nb_edge_layer=2, layernorm=True,
                     hidden_activation="GELU")
    nodes = rng.normal(size=(n, latent)).astype(np.float32)
    edges = rng.normal(size=(e, latent)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    graph = Graph(jnp.asarray(senders), jnp.asarray(receivers),
                  jnp.ones((e,), bool))

    cell = InteractionGNNCell(cfg)
    variables = cell.init(jax.random.key(1), jnp.asarray(nodes),
                          jnp.asarray(edges), graph)

    # torch oracle with the same per-update MLPs
    t_node = torch_mlp(2 * latent, hidden, latent, 2, "GELU", "GELU", True)
    t_edge = torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True)
    params = dict(variables["params"])
    params["CheckpointMLP_0"] = copy_mlp_params(t_node, params["CheckpointMLP_0"])
    params["CheckpointMLP_1"] = copy_mlp_params(t_edge, params["CheckpointMLP_1"])

    ours_nodes, ours_edges = cell.apply({"params": params},
                                        jnp.asarray(nodes),
                                        jnp.asarray(edges), graph)

    tn = torch.from_numpy(nodes)
    te = torch.from_numpy(edges)
    ts = torch.from_numpy(senders.astype(np.int64))
    tr = torch.from_numpy(receivers.astype(np.int64))
    msg = torch.zeros(n, latent).index_add_(0, tr, te)
    new_nodes = t_node(torch.cat([tn, msg], -1)) + tn
    edge_in = torch.cat([new_nodes[ts], new_nodes[tr], te], -1)
    new_edges = t_edge(edge_in) + te

    np.testing.assert_allclose(np.asarray(ours_nodes),
                               new_nodes.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_edges),
                               new_edges.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_hierarchical_cell_parity(rng):
    """One hierarchical iteration vs the reference update equations
    (gnn_utils.py:119-169): weighted bipartite/supergraph scatter_add
    convolutions, 4 MLP+residual updates, and the semantic update order
    (supernodes from OLD nodes, nodes from NEW supernodes)."""
    from hierarchicalgnn_tpu.models.cells import HierarchicalGNNCell

    latent, hidden = 16, 32
    n, c = 24, 6
    e, be, se = 60, 40, 18
    cfg = ArchConfig(latent=latent, hidden=hidden, nb_node_layer=2,
                     nb_edge_layer=2, layernorm=True,
                     hidden_activation="GELU")
    nodes = rng.normal(size=(n, latent)).astype(np.float32)
    edges = rng.normal(size=(e, latent)).astype(np.float32)
    supernodes = rng.normal(size=(c, latent)).astype(np.float32)
    superedges = rng.normal(size=(se, latent)).astype(np.float32)
    g_s = rng.integers(0, n, e).astype(np.int32)
    g_r = rng.integers(0, n, e).astype(np.int32)
    b_s = rng.integers(0, n, be).astype(np.int32)   # hit side
    b_r = rng.integers(0, c, be).astype(np.int32)   # supernode side
    s_s = rng.integers(0, c, se).astype(np.int32)
    s_r = rng.integers(0, c, se).astype(np.int32)
    bw = rng.uniform(0.1, 2.0, (be, 1)).astype(np.float32)
    sw = rng.uniform(0.1, 2.0, (se, 1)).astype(np.float32)

    graph = Graph(jnp.asarray(g_s), jnp.asarray(g_r), jnp.ones((e,), bool))
    bgraph = Graph(jnp.asarray(b_s), jnp.asarray(b_r), jnp.ones((be,), bool))
    sgraph = Graph(jnp.asarray(s_s), jnp.asarray(s_r), jnp.ones((se,), bool))

    cell = HierarchicalGNNCell(cfg)
    variables = cell.init(
        jax.random.key(2), jnp.asarray(nodes), jnp.asarray(edges),
        jnp.asarray(supernodes), jnp.asarray(superedges), graph,
        (bgraph, jnp.asarray(bw)), (sgraph, jnp.asarray(sw)))

    # torch oracles, construction order node/edge/supernode/superedge
    t_node = torch_mlp(3 * latent, hidden, latent, 2, "GELU", "GELU", True)
    t_edge = torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True)
    t_super = torch_mlp(3 * latent, hidden, latent, 2, "GELU", "GELU", True)
    t_sedge = torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True)
    params = dict(variables["params"])
    for key, tmlp in [("CheckpointMLP_0", t_node), ("CheckpointMLP_1", t_edge),
                      ("CheckpointMLP_2", t_super), ("CheckpointMLP_3", t_sedge)]:
        params[key] = copy_mlp_params(tmlp, params[key])

    ours = cell.apply({"params": params}, jnp.asarray(nodes),
                      jnp.asarray(edges), jnp.asarray(supernodes),
                      jnp.asarray(superedges), graph,
                      (bgraph, jnp.asarray(bw)), (sgraph, jnp.asarray(sw)))

    tn = torch.from_numpy(nodes)
    te = torch.from_numpy(edges)
    tsn = torch.from_numpy(supernodes)
    tse = torch.from_numpy(superedges)
    tbw = torch.from_numpy(bw)
    tsw = torch.from_numpy(sw)
    L = lambda a: torch.from_numpy(a.astype(np.int64))

    # supernode update from OLD nodes (gnn_utils.py:138-145)
    node_msg = torch.zeros(c, latent).index_add_(0, L(b_r), tbw * tn[L(b_s)])
    attn_msg = torch.zeros(c, latent).index_add_(0, L(s_r), tse * tsw)
    new_super = t_super(torch.cat([tsn, attn_msg, node_msg], -1)) + tsn
    # node update from NEW supernodes (gnn_utils.py:119-127)
    super_msg = torch.zeros(n, latent).index_add_(0, L(b_s),
                                                  tbw * new_super[L(b_r)])
    edge_msg = torch.zeros(n, latent).index_add_(0, L(g_r), te)
    new_nodes = t_node(torch.cat([tn, edge_msg, super_msg], -1)) + tn
    # superedge / edge updates (gnn_utils.py:147-153, :129-135)
    new_sedges = t_sedge(torch.cat(
        [new_super[L(s_s)], new_super[L(s_r)], tse], -1)) + tse
    new_edges = t_edge(torch.cat(
        [new_nodes[L(g_s)], new_nodes[L(g_r)], te], -1)) + te

    for got, want in zip(ours, (new_nodes, new_edges, new_super, new_sedges)):
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_ec_model_full_parity(rng):
    """Full EC-IN forward vs a torch oracle of the reference model
    (EdgeClassifier/Models/IN.py:80-128): encoders, bidirected graph,
    N interaction iterations, paired-edge classifier head, sigmoid —
    whole-model per-layer activation parity."""
    from hierarchicalgnn_tpu.models.models import EdgeClassifierIN

    latent, hidden, iters = 8, 16, 3
    n, e = 25, 50
    cfg = ArchConfig(spatial_channels=3, latent=latent, hidden=hidden,
                     n_interaction_graph_iters=iters, nb_node_layer=2,
                     nb_edge_layer=2, output_layers=2, layernorm=True,
                     hidden_activation="GELU",
                     hidden_output_activation="Tanh", use_pallas=False)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    graph = Graph(jnp.asarray(s), jnp.asarray(r), jnp.ones((e,), bool))

    model = EdgeClassifierIN(cfg)
    variables = model.init(jax.random.key(3), jnp.asarray(x), graph)

    t_node_enc = torch_mlp(3, hidden, latent, 2, "GELU", "GELU", True)
    t_edge_enc = torch_mlp(6, hidden, latent, 2, "GELU", "GELU", True)
    t_cells = [(torch_mlp(2 * latent, hidden, latent, 2, "GELU", "GELU", True),
                torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True))
               for _ in range(iters)]
    t_cls = torch_mlp(2 * latent, hidden, 1, 2, "Tanh", None, True)

    params = dict(variables["params"])
    block = dict(params["InteractionGNNBlock_0"])
    block["CheckpointMLP_0"] = copy_mlp_params(t_node_enc, block["CheckpointMLP_0"])
    block["CheckpointMLP_1"] = copy_mlp_params(t_edge_enc, block["CheckpointMLP_1"])
    for i, (t_n, t_e) in enumerate(t_cells):
        cell = dict(block[f"InteractionGNNCell_{i}"])
        cell["CheckpointMLP_0"] = copy_mlp_params(t_n, cell["CheckpointMLP_0"])
        cell["CheckpointMLP_1"] = copy_mlp_params(t_e, cell["CheckpointMLP_1"])
        block[f"InteractionGNNCell_{i}"] = cell
    params["InteractionGNNBlock_0"] = block
    params["MLP_0"] = copy_mlp_params(t_cls, params["MLP_0"])

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), graph))

    tx = torch.from_numpy(x)
    L = lambda a: torch.from_numpy(a.astype(np.int64))
    ds = torch.cat([L(s), L(r)])   # directed_graph = cat([g, g.flip(0)])
    dr = torch.cat([L(r), L(s)])
    tnodes = t_node_enc(tx)
    tedges = t_edge_enc(torch.cat([tx[ds], tx[dr]], -1))
    for t_n, t_e in t_cells:
        msg = torch.zeros(n, latent).index_add_(0, dr, tedges)
        tnodes = t_n(torch.cat([tnodes, msg], -1)) + tnodes
        tedges = t_e(torch.cat([tnodes[ds], tnodes[dr], tedges], -1)) + tedges
    scores = torch.sigmoid(
        t_cls(torch.cat([tedges[:e], tedges[e:]], -1)).squeeze(1))

    np.testing.assert_allclose(ours, scores.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_pt_weighting_parity(rng):
    """Weight curve vs the reference formula (edge_classifier_base.py:82-97)."""
    from hierarchicalgnn_tpu.train.losses import pt_weighting
    hp = {"weight_leak": 1.0, "weight_min": 0.5, "pt_interval": 0.5,
          "ptcut": 1.0}
    pt = rng.uniform(0, 5, 200).astype(np.float32)

    tpt = torch.from_numpy(pt.copy())
    h = lambda i: torch.heaviside(i, torch.zeros(1))
    minimum = lambda i: torch.minimum(i, torch.ones(1))
    eps, cap = hp["weight_leak"], hp["ptcut"]
    cut = hp["ptcut"] - hp["pt_interval"]
    mw = hp["weight_min"]
    expected = (mw + (1 - mw) * minimum(h(tpt - cut) * (tpt - cut) / (cap - cut))
                + eps * h(tpt - cap) * (tpt - cap))

    ours = np.asarray(pt_weighting(jnp.asarray(pt), hp))
    np.testing.assert_allclose(ours, expected.numpy(), rtol=1e-5, atol=1e-6)


def test_hinge_loss_parity(rng):
    """Squared hinge-embedding loss vs torch (embedding_base.py:167-175)."""
    from hierarchicalgnn_tpu.train.losses import squared_hinge_loss
    dist = rng.uniform(0, 2, 100).astype(np.float32)
    y = rng.random(100) > 0.5
    w = rng.uniform(0, 1, 100).astype(np.float32)
    margin = 1.0

    hinge = torch.ones(100)
    hinge[~torch.from_numpy(y)] = -1
    tloss = torch.nn.functional.hinge_embedding_loss(
        torch.from_numpy(dist), hinge, margin=margin,
        reduction="none").square()
    expected = torch.dot(tloss, torch.from_numpy(w)).item()

    ours = float(squared_hinge_loss(jnp.asarray(dist), jnp.asarray(y),
                                    jnp.asarray(w), margin))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_batchnorm_parity(rng):
    """MaskedBatchNorm vs torch BatchNorm1d(1) on unmasked data
    (gnn_utils.py:179,209): train-mode stats and running-stat updates."""
    from hierarchicalgnn_tpu.models.mlp import MaskedBatchNorm
    x = rng.normal(2.0, 3.0, 256).astype(np.float32)

    tbn = tnn.BatchNorm1d(1)
    t_out = tbn(torch.from_numpy(x).unsqueeze(1)).squeeze(1)

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x),
                        jnp.ones(256, bool), True)
    out, updated = bn.apply(variables, jnp.asarray(x), jnp.ones(256, bool),
                            True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(updated["batch_stats"]["mean"][0]),
        float(tbn.running_mean[0]), rtol=1e-4)
    np.testing.assert_allclose(
        float(updated["batch_stats"]["var"][0]),
        float(tbn.running_var[0]), rtol=1e-4)


def test_normalize_parity(rng):
    from hierarchicalgnn_tpu.models.blocks import l1_normalize, l2_normalize
    x = rng.normal(size=(50, 8)).astype(np.float32)
    t2 = torch.nn.functional.normalize(torch.from_numpy(x)).numpy()
    t1 = torch.nn.functional.normalize(torch.from_numpy(x), p=1).numpy()
    np.testing.assert_allclose(np.asarray(l2_normalize(jnp.asarray(x))), t2,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l1_normalize(jnp.asarray(x))), t1,
                               rtol=1e-5, atol=1e-6)
