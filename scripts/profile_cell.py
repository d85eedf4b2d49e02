"""Micro-profiler: per-component timing of the GNN cells at flagship shape.

The step-level ablation (scripts/profile_bc_step.py) shows where the
milliseconds go between subsystems; this script drills into ONE
interaction / hierarchical cell at the BC-HGNN-GMM workload shape
(N=24576 nodes, E=49152 flat edges, C=3072 clusters, E_b=N*5 bipartite
edges, E_s=2*C*10 superedges, latent 256) and times each constituent:

  * the four MLP applications (node / edge / supernode / superedge)
  * the four aggregations (flat edge->node, weighted bip->super,
    weighted super->bip->node, weighted super->super)
  * the endpoint gathers feeding the edge/superedge MLPs

forward and forward+backward, via the fori_loop+readback pattern of
bench.py (axon's ``block_until_ready`` returns early).

Usage: python scripts/profile_cell.py [--dtype bfloat16] [--iters 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

N = 24576
E = 49152
C = 3072
K_BIP = 5
K_SUP = 10
E_B = N * K_BIP
E_S = 2 * C * K_SUP
D = 256


def _apply_scale(scale):
    global N, E, C, E_B, E_S
    N //= scale
    E //= scale
    C //= scale
    E_B = N * K_BIP
    E_S = 2 * C * K_SUP


def timed(fn, args, iters):
    def make(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                return acc + fn(i, *a)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    f_many, f_one = make(iters), make(1)
    float(f_many(*args))
    float(f_one(*args))
    t0 = time.perf_counter()
    float(f_many(*args))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_one(*args))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--only", default=None)
    ap.add_argument("--scale", type=int, default=1,
                    help="divide all shapes (CPU smoke test)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if args.scale > 1:
        _apply_scale(args.scale)

    from hierarchicalgnn_tpu.models.cells import (
        HierarchicalGNNCell, InteractionGNNCell)
    from hierarchicalgnn_tpu.models.mlp import MLP
    from hierarchicalgnn_tpu.ops.graph import Graph
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, build_transposed_plan, gather_edge_endpoints,
        sorted_aggregate, sorted_aggregate_weighted)
    from hierarchicalgnn_tpu.utils.config import ArchConfig

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = ArchConfig(latent=D, hidden=2 * D, emb_dim=8, nb_node_layer=3,
                     nb_edge_layer=2, output_layers=3, layernorm=True,
                     hidden_activation="GELU", hidden_output_activation="Tanh",
                     share_weight=False, n_interaction_graph_iters=6,
                     n_hierarchical_graph_iters=6, max_clusters=C,
                     use_pallas=True, remat=False,
                     compute_dtype=args.dtype)
    interp = jax.default_backend() != "tpu"

    rng = np.random.default_rng(0)

    def mkgraph(n_edges, n_src, n_dst):
        s = rng.integers(0, n_src, n_edges).astype(np.int32)
        r = np.sort(rng.integers(0, n_dst, n_edges)).astype(np.int32)
        return jnp.asarray(s), jnp.asarray(r), jnp.ones((n_edges,), bool)

    # flat graph (receiver-sorted, as sorted_graph_mode produces)
    fs, fr, fm = mkgraph(E, N, N)
    fplan = build_sorted_plan(fs, fr, fm, N)
    fplan_t, f_r2s = build_transposed_plan(fplan, fs, fr, fm, N)
    fgraph = Graph(fplan.senders_sorted, fplan.receivers_sorted,
                   fplan.edge_mask_sorted)

    # bipartite graph: senders = nodes, receivers = clusters
    bs, br, bm = mkgraph(E_B, N, C)
    b1 = build_sorted_plan(bs, br, bm, C)          # -> super
    b2 = build_sorted_plan(br, bs, bm, N)          # -> node
    # supergraph
    ss, sr, sm = mkgraph(E_S, C, C)
    splan = build_sorted_plan(ss, sr, sm, C)
    splan_t, s_r2s = build_transposed_plan(splan, ss, sr, sm, C)
    sgraph = Graph(splan.senders_sorted, splan.receivers_sorted,
                   splan.edge_mask_sorted)

    # edge tensors sized from the (block-padded) plan arrays
    e_pad = fplan.receivers_sorted.shape[0]
    es_pad = splan.receivers_sorted.shape[0]
    eb1_pad = b1.receivers_sorted.shape[0]
    eb2_pad = b2.receivers_sorted.shape[0]
    nodes = jnp.asarray(rng.normal(size=(N, D)), dtype)
    edges = jnp.asarray(rng.normal(size=(e_pad, D)), dtype)
    supernodes = jnp.asarray(rng.normal(size=(C, D)), dtype)
    superedges = jnp.asarray(rng.normal(size=(es_pad, D)), dtype)
    w_b1 = jnp.asarray(rng.uniform(0.1, 1, (eb1_pad, 1)), jnp.float32)
    w_b2 = jnp.asarray(rng.uniform(0.1, 1, (eb2_pad, 1)), jnp.float32)
    w_s = jnp.asarray(rng.uniform(0.1, 1, (es_pad, 1)), jnp.float32)

    results = {}

    def run(name, fn, data, grad=True):
        # i-dependent perturbation defeats loop hoisting; costs one extra
        # elementwise pass over the input (same for every item).
        if only and name not in only:
            return
        t_f = timed(lambda i, d: fn(
            d + (i.astype(jnp.float32) * 1e-12).astype(d.dtype)
        ).ravel()[0].astype(jnp.float32), (data,), args.iters)
        results[name] = {"fwd_ms": round(t_f * 1e3, 3)}
        if grad:
            g = jax.grad(lambda d: jnp.sum(fn(d).astype(jnp.float32)))
            t_b = timed(lambda i, d: g(
                d + (i.astype(jnp.float32) * 1e-12).astype(d.dtype)
            ).ravel()[0].astype(jnp.float32), (data,), args.iters)
            results[name]["fwdbwd_ms"] = round(t_b * 1e3, 3)
        print(f"{name:22s} {results[name]}", flush=True)

    # --- aggregations ---
    run("agg_flat_e2n", lambda d: sorted_aggregate(d, fplan, interp)[0],
        edges)
    bip_gathered = nodes[b1.senders_sorted]
    run("agg_bip2super_w", lambda d: sorted_aggregate_weighted(
        d, w_b1[:, 0], b1, interp)[0], bip_gathered)
    sup_gathered = supernodes[b2.senders_sorted]
    run("agg_super2node_w", lambda d: sorted_aggregate_weighted(
        d, w_b2[:, 0], b2, interp)[0], sup_gathered)
    run("agg_super2super_w", lambda d: sorted_aggregate_weighted(
        d, w_s[:, 0], splan, interp)[0], superedges)

    # --- gathers ---
    run("gather_bip_nodes", lambda d: d[b1.senders_sorted][0], nodes)
    run("gather_bip_super", lambda d: d[b2.senders_sorted][0], supernodes)
    run("gather_flat_endpoints", lambda d: gather_edge_endpoints(
        d, fplan, fplan_t, f_r2s, interp)[0][0], nodes)
    run("gather_super_endpoints", lambda d: gather_edge_endpoints(
        d, splan, splan_t, s_r2s, interp)[0][0], supernodes)

    # --- MLPs (flax-initialized, applied to concatenated inputs) ---
    def mlp(hidden_layers, out_act):
        return MLP(hidden_size=cfg.hidden, output_size=cfg.latent,
                   hidden_layers=hidden_layers, layer_norm=True,
                   output_activation=out_act, hidden_activation="GELU",
                   compute_dtype=args.dtype)

    node_in = jnp.concatenate([nodes, nodes, nodes], -1)
    edge_in = jnp.concatenate([edges, edges, edges], -1)
    sup_in = jnp.concatenate([supernodes] * 3, -1)
    se_in = jnp.concatenate([superedges] * 3, -1)
    for name, net_layers, act, data in [
            ("mlp_node_24k", cfg.nb_node_layer, "GELU", node_in),
            ("mlp_edge_49k", cfg.nb_edge_layer, "Tanh", edge_in),
            ("mlp_super_3k", cfg.nb_node_layer, "GELU", sup_in),
            ("mlp_superedge_61k", cfg.nb_edge_layer, "Tanh", se_in)]:
        if only and name not in only:
            continue
        net = mlp(net_layers, act)
        params = net.init(jax.random.key(0), data)
        run(name, lambda d, net=net, params=params: net.apply(params, d),
            data)

    # --- whole cells ---
    aggs = {
        "edge_to_node": lambda d: sorted_aggregate(d, fplan, interp),
        "bip_to_super": (lambda d: sorted_aggregate_weighted(
            d, w_b1[:, 0], b1, interp), b1.senders_sorted),
        "bip_to_node": (lambda d: sorted_aggregate_weighted(
            d, w_b2[:, 0], b2, interp), b2.senders_sorted),
        "super_to_super": lambda d: sorted_aggregate_weighted(
            d, w_s[:, 0], splan, interp),
    }
    gathers = {
        "graph": lambda x: gather_edge_endpoints(x, fplan, fplan_t, f_r2s,
                                                 interp),
        "super": lambda x: gather_edge_endpoints(x, splan, splan_t, s_r2s,
                                                 interp),
    }

    if not only or "ignn_cell" in (only or set()):
        cell = InteractionGNNCell(cfg)
        fgather = gathers["graph"]
        fagg = aggs["edge_to_node"]
        params = cell.init(jax.random.key(0), nodes, edges, fgraph,
                           agg=fagg, gather=fgather)

        def ignn(d):
            n2, e2 = cell.apply(params, d, edges, fgraph, agg=fagg,
                                gather=fgather)
            return n2
        run("ignn_cell", ignn, nodes)

    if not only or "hgnn_cell" in (only or set()):
        hcell = HierarchicalGNNCell(cfg)
        hparams = hcell.init(jax.random.key(0), nodes, edges, supernodes,
                             superedges, fgraph, (None, w_b1), (sgraph, w_s),
                             aggs=aggs, gathers=gathers)

        def hgnn(d):
            n2, e2, s2, se2 = hcell.apply(
                hparams, d, edges, supernodes, superedges, fgraph,
                (None, w_b1), (sgraph, w_s), aggs=aggs, gathers=gathers)
            return n2
        run("hgnn_cell", hgnn, nodes)

    print(json.dumps({"dtype": args.dtype or "float32",
                      "shapes": {"N": N, "E": E, "C": C, "E_b": E_B,
                                 "E_s": E_S, "D": D},
                      "results": results}))


if __name__ == "__main__":
    main()
