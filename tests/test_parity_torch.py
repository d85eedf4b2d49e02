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
                     hidden_output_activation="Tanh", use_pallas=False,
                     compute_dtype="float32")
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


def torch_hier_cell(latent, hidden):
    """The 4 MLPs of one HierarchicalGNNCell, construction order
    node/edge/supernode/superedge (gnn_utils.py:119-169)."""
    return (torch_mlp(3 * latent, hidden, latent, 3, "GELU", "GELU", True),
            torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True),
            torch_mlp(3 * latent, hidden, latent, 3, "GELU", "GELU", True),
            torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True))


def torch_hier_cell_step(mlps, tn, te, tsn, tse, graphs, weights):
    """One reference hierarchical iteration (gnn_utils.py:119-169)."""
    t_node, t_edge, t_super, t_sedge = mlps
    (g_s, g_r), (b_s, b_r), (s_s, s_r) = graphs
    tbw, tsw = weights
    n, latent = tn.shape
    c = tsn.shape[0]
    L = lambda a: torch.from_numpy(np.asarray(a).astype(np.int64))
    node_msg = torch.zeros(c, latent).index_add_(0, L(b_r), tbw * tn[L(b_s)])
    attn_msg = torch.zeros(c, latent).index_add_(0, L(s_r), tse * tsw)
    new_super = t_super(torch.cat([tsn, attn_msg, node_msg], -1)) + tsn
    super_msg = torch.zeros(n, latent).index_add_(
        0, L(b_s), tbw * new_super[L(b_r)])
    edge_msg = torch.zeros(n, latent).index_add_(0, L(g_r), te)
    new_nodes = t_node(torch.cat([tn, edge_msg, super_msg], -1)) + tn
    new_sedges = t_sedge(torch.cat(
        [new_super[L(s_s)], new_super[L(s_r)], tse], -1)) + tse
    new_edges = t_edge(torch.cat(
        [new_nodes[L(g_s)], new_nodes[L(g_r)], te], -1)) + te
    return new_nodes, new_edges, new_super, new_sedges


def _bn_eval(logits):
    """torch BatchNorm1d(1) in eval mode at init stats (mean 0, var 1)."""
    return logits / np.sqrt(1.0 + 1e-5)


def test_bc_model_full_parity(rng):
    """Whole-model BC-HGNN-GMM forward vs a torch oracle of the reference
    chain (BipartiteClassification/Models/HGNN_GMM.py:236-346): IN block ->
    clustering cut -> cluster means -> dynamic super/bipartite weights ->
    1-norm supernode init -> N hierarchical cells -> bipartite score head.

    Determinism pins (VERDICT r1 item 5): the ``score_cut`` buffer is set to
    a fixed value (eval mode uses it verbatim), and the kNN STRUCTURES of
    the dynamic graphs are taken from our oracle-tested ops (ops/knn.py,
    ops/graph.py:symmetrize) -- the oracle recomputes every differentiable
    quantity (weights, BatchNorm, aggregations, all MLPs) in torch.
    """
    from flax.core import unfreeze
    from hierarchicalgnn_tpu.models.models import BipartiteClassifierHGNN
    from hierarchicalgnn_tpu.ops.connected import cluster_labels
    from hierarchicalgnn_tpu.ops.sddmm import edge_cosine_likelihood

    latent, hidden, emb_dim = 16, 32, 8
    in_iters, h_iters = 2, 2
    n_groups, per = 8, 6
    n, c_max = n_groups * per, 16
    k_b, k_s, min_cs = 2, 3, 3
    cfg = ArchConfig(spatial_channels=3, latent=latent, hidden=hidden,
                     emb_dim=emb_dim, n_interaction_graph_iters=in_iters,
                     n_hierarchical_graph_iters=h_iters, nb_node_layer=3,
                     nb_edge_layer=2, output_layers=3, layernorm=True,
                     hidden_activation="GELU", hidden_output_activation="Tanh",
                     bipartitegraph_sparsity=k_b, supergraph_sparsity=k_s,
                     min_cluster_size=min_cs, max_clusters=c_max,
                     gmm_iters=10, knn_block_size=64, use_pallas=False,
                     compute_dtype="float32")
    # clustered inputs so the pinned cut yields >3 clusters (no over-cut
    # fallback) -- the interesting path through the hierarchy
    centers = rng.normal(size=(n_groups, 3)).astype(np.float32) * 2
    x = (centers.repeat(per, 0)
         + 0.05 * rng.normal(size=(n, 3))).astype(np.float32)
    s_list, r_list = [], []
    for g in range(n_groups):
        idx = np.arange(g * per, (g + 1) * per)
        for i in range(per - 1):
            s_list.append(idx[i]); r_list.append(idx[i + 1])
        s_list.append(idx[0]); r_list.append(idx[2])
    for _ in range(20):  # cross-group fakes
        s_list.append(rng.integers(0, n)); r_list.append(rng.integers(0, n))
    s = np.array(s_list, np.int32)
    r = np.array(r_list, np.int32)
    e = len(s)
    graph = Graph(jnp.asarray(s), jnp.asarray(r), jnp.ones((e,), bool))
    node_mask = jnp.ones((n,), bool)

    model = BipartiteClassifierHGNN(cfg)
    variables = unfreeze(model.init(jax.random.key(4), x, graph,
                                    node_mask=node_mask, training=False))
    # pin the clustering cut and the kNN radius (eval uses them verbatim)
    SCORE_CUT, RADIUS = 1.5, 2.5
    hb = variables["buffers"]["HierarchicalGNNBlock_0"]
    hb["score_cut"] = jnp.asarray([SCORE_CUT])
    hb["DynamicGraphConstruction_0"]["knn_radius"] = jnp.asarray([RADIUS])
    hb["DynamicGraphConstruction_1"]["knn_radius"] = jnp.asarray([RADIUS])

    # -------- torch oracle parameters copied into the flax tree ----------
    params = variables["params"]

    def copy_into(sub, key, tmlp):
        sub[key] = copy_mlp_params(tmlp, sub[key])

    t_node_enc = torch_mlp(3, hidden, latent, 3, "GELU", "GELU", True)
    t_edge_enc = torch_mlp(6, hidden, latent, 2, "GELU", "GELU", True)
    t_emb = torch_mlp(latent, hidden, emb_dim, 3, "Tanh", None, True)
    t_in_cells = [(torch_mlp(2 * latent, hidden, latent, 3, "GELU", "GELU", True),
                   torch_mlp(3 * latent, hidden, latent, 2, "GELU", "Tanh", True))
                  for _ in range(in_iters)]
    block = params["InteractionGNNBlock_0"]
    copy_into(block, "CheckpointMLP_0", t_node_enc)
    copy_into(block, "CheckpointMLP_1", t_edge_enc)
    copy_into(block, "MLP_0", t_emb)
    for i, (t_n, t_e) in enumerate(t_in_cells):
        copy_into(block[f"InteractionGNNCell_{i}"], "CheckpointMLP_0", t_n)
        copy_into(block[f"InteractionGNNCell_{i}"], "CheckpointMLP_1", t_e)

    t_sn_enc = torch_mlp(latent, hidden, latent - emb_dim, 3, "GELU", "GELU", True)
    t_se_enc = torch_mlp(2 * latent, hidden, latent, 2, "GELU", "GELU", True)
    t_h_cells = [torch_hier_cell(latent, hidden) for _ in range(h_iters)]
    hblock = params["HierarchicalGNNBlock_0"]
    copy_into(hblock, "CheckpointMLP_0", t_sn_enc)
    copy_into(hblock, "CheckpointMLP_1", t_se_enc)
    for i, mlps in enumerate(t_h_cells):
        for j, tmlp in enumerate(mlps):
            copy_into(hblock[f"HierarchicalGNNCell_{i}"],
                      f"CheckpointMLP_{j}", tmlp)
    t_head = torch_mlp(2 * latent, hidden, 1, 3, "Tanh", None, True)
    copy_into(params, "CheckpointMLP_0", t_head)

    # -------------------- our forward ------------------------------------
    bgraph, scores, intermediate, aux = model.apply(
        variables, x, graph, node_mask=node_mask, training=False)
    clusters = np.asarray(aux["clusters"])
    n_clusters = int(aux["n_clusters"])

    # -------------------- torch oracle -----------------------------------
    tx = torch.from_numpy(x)
    L = lambda a: torch.from_numpy(np.asarray(a).astype(np.int64))
    ds, dr = np.concatenate([s, r]), np.concatenate([r, s])  # bidirected
    tnodes = t_node_enc(tx)
    tedges = t_edge_enc(torch.cat([tx[L(ds)], tx[L(dr)]], -1))
    for t_n, t_e in t_in_cells:
        msg = torch.zeros(n, latent).index_add_(0, L(dr), tedges)
        tnodes = t_n(torch.cat([tnodes, msg], -1)) + tnodes
        tedges = t_e(torch.cat([tnodes[L(ds)], tnodes[L(dr)], tedges], -1)) + tedges
    t_int = torch.nn.functional.normalize(t_emb(tnodes))
    np.testing.assert_allclose(np.asarray(intermediate),
                               t_int.detach().numpy(), rtol=1e-4, atol=1e-5)

    # clustering cut cross-check vs scipy CC at the pinned threshold
    # (HGNN_GMM.py:215-236 incl. min_cluster_size drop)
    import scipy.sparse as sp
    like = np.asarray(edge_cosine_likelihood(
        jnp.asarray(intermediate), jnp.asarray(ds), jnp.asarray(dr)))
    keep = like >= SCORE_CUT
    adj = sp.coo_matrix((np.ones(keep.sum()), (ds[keep], dr[keep])),
                        shape=(n, n))
    ncc, lab = sp.csgraph.connected_components(adj, directed=False)
    sizes = np.bincount(lab)
    ref_valid = sizes[lab] >= min_cs
    assert n_clusters > 3, "over-cut fallback fired; pick a different cut"
    assert (clusters >= 0).sum() == ref_valid.sum()
    # same partition: our cluster ids and scipy's co-partition the kept hits
    pairs = {}
    for i in range(n):
        if clusters[i] >= 0:
            pairs.setdefault(clusters[i], set()).add(lab[i])
    assert all(len(v) == 1 for v in pairs.values())
    assert n_clusters == len(pairs)

    # cluster means over OUR labels (scatter_mean, HGNN_GMM.py:251-252)
    t_means = torch.zeros(c_max, emb_dim)
    t_cnt = torch.zeros(c_max)
    sel = clusters >= 0
    t_means.index_add_(0, L(clusters[sel]), t_int[torch.from_numpy(sel)])
    t_cnt.index_add_(0, L(clusters[sel]), torch.ones(int(sel.sum())))
    t_means = t_means / t_cnt.clamp(min=1.0)[:, None]
    t_means = torch.nn.functional.normalize(t_means)
    cvalid = np.arange(c_max) < n_clusters
    t_means = t_means * torch.from_numpy(cvalid.astype(np.float32))[:, None]

    # super graph STRUCTURE from our oracle-tested ops on the oracle means
    from hierarchicalgnn_tpu.ops.knn import knn, knn_to_edges
    from hierarchicalgnn_tpu.ops.graph import symmetrize
    m_j = jnp.asarray(t_means.detach().numpy())
    idx, _ = knn(m_j, m_j, k_s, RADIUS, q_mask=jnp.asarray(cvalid),
                 p_mask=jnp.asarray(cvalid), block_size=64)
    ss_, sr_, sm_ = knn_to_edges(idx)
    sgraph = symmetrize(Graph(ss_, sr_, sm_))
    s_s, s_r = np.asarray(sgraph.senders), np.asarray(sgraph.receivers)
    s_m = np.asarray(sgraph.edge_mask)
    # super weights in torch (gnn_utils.py:207-213: dot -> BN -> sigmoid -> /mean)
    s_logit = (t_means[L(s_s)] * t_means[L(s_r)]).sum(-1).detach().numpy()
    s_w = 1.0 / (1.0 + np.exp(-_bn_eval(s_logit)))
    s_w = s_w / np.maximum((s_w * s_m).sum() / np.maximum(s_m.sum(), 1), 1e-12)
    s_w = np.where(s_m, s_w, 0.0).astype(np.float32)

    # bipartite STRUCTURE from the model output; weights in torch (exp)
    b_s, b_r = np.asarray(bgraph.senders), np.asarray(bgraph.receivers)
    b_m = np.asarray(bgraph.edge_mask)
    b_logit = (t_int[L(b_s)] * t_means[L(b_r)]).sum(-1).detach().numpy()
    b_w = np.exp(_bn_eval(b_logit))
    b_w = b_w / np.maximum((b_w * b_m).sum() / np.maximum(b_m.sum(), 1), 1e-12)
    b_w = np.where(b_m, b_w, 0.0).astype(np.float32)

    # supernode init (HGNN_GMM.py:269-271): 1-norm nodes, weighted agg
    t_init = torch.nn.functional.normalize(tnodes, p=1)
    tbw = torch.from_numpy(b_w)[:, None]
    agg0 = torch.zeros(c_max, latent).index_add_(0, L(b_r), tbw * t_init[L(b_s)])
    t_supern = torch.cat([t_means, t_sn_enc(agg0)], -1)
    t_supere = t_se_enc(torch.cat([t_supern[L(s_s)], t_supern[L(s_r)]], -1))

    # hierarchical cells
    tsw = torch.from_numpy(s_w)[:, None]
    tn_, te_, tsn_, tse_ = tnodes, tedges, t_supern, t_supere
    for mlps in t_h_cells:
        tn_, te_, tsn_, tse_ = torch_hier_cell_step(
            mlps, tn_, te_, tsn_, tse_,
            ((ds, dr), (b_s, b_r), (s_s, s_r)), (tbw, tsw))

    # bipartite head (HGNN_GMM.py:342-345)
    t_scores = torch.sigmoid(t_head(
        torch.cat([tn_[L(b_s)], tsn_[L(b_r)]], -1)).squeeze(1))
    t_scores = t_scores * torch.from_numpy(b_m.astype(np.float32))

    np.testing.assert_allclose(np.asarray(scores), t_scores.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
