"""Warm-state profiling of the flagship training step.

The data-dependent phases of the BC-HGNN-GMM forward -- connected
components (``lax.while_loop`` until label convergence), the over-cut
re-cluster fallback (``lax.cond``), and auction matching (round cap 256)
-- run at their WORST on freshly initialized params: random embeddings
give a noisy GMM cut whose kept graph has large diameter, and random
bipartite scores produce auction price wars.  scripts/profile_bc_step.py
therefore measures a transient, not the steady state that dominates a
training run.

This script times the train step at the initialized state AND after K
warmup training steps, and decomposes the warm state:

  * train step (init) vs train step (warmed)
  * CC alone on the real warm keep-mask, with an iteration-count readout
  * auction matching alone on the real warm scores, with round count
  * pooling / graph-construction probes on the real warm embeddings

Usage: python scripts/profile_phases.py [--dtype bfloat16] [--warmup 40]
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

from profile_bc_step import BASE_OVERRIDES, build, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=40)
    ap.add_argument("--remat", default="none")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke test)")
    args = ap.parse_args()

    from profile_bc_step import _REMAT
    overrides = {"remat": _REMAT[args.remat]}
    if args.small:
        BASE_OVERRIDES.update(
            n_nodes_max=1024, n_edges_max=2048, max_clusters=128,
            max_particles=256, latent=32, hidden_ratio=2,
            n_interaction_graph_iters=1, n_hierarchical_graph_iters=1,
            gmm_iters=10, knn_block_size=256)
    model, pipeline, optimizer, params, buffers, opt_state, batch = build(
        overrides, args.dtype, n_particles=60 if args.small else 3000)
    print(f"backend={jax.default_backend()} dtype={args.dtype or 'float32'}",
          flush=True)

    def train_k(params, buffers, opt_state, k):
        def body(i, carry):
            params, buffers, opt_state = carry

            def loss_fn(p):
                loss, (nb, metrics) = pipeline.loss(
                    p, buffers, batch, 0, training=True)
                return loss, nb

            (_, nb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, nb, new_opt

        return jax.lax.fori_loop(0, k, body, (params, buffers, opt_state))

    jit_train = jax.jit(train_k, static_argnums=3)
    results = {}

    def time_state(tag, p, b, o):
        def step_k(k):
            return train_k(p, b, o, k)
        results[tag] = round(timed(step_k, args.iters) * 1e3, 2)
        print(f"{tag:28s} {results[tag]:8.1f} ms", flush=True)

    time_state("train_step_init", params, buffers, opt_state)

    # --- warm the state with K real training steps ---
    wp, wb, wo = jit_train(params, buffers, opt_state, args.warmup)
    wp = jax.tree.map(lambda x: x, wp)
    float(jax.tree.leaves(wp)[0].ravel()[0])
    time_state("train_step_warm", wp, wb, wo)

    # --- decompose the warm forward: real embeddings / keep mask / scores ---
    variables = {"params": wp, **wb}
    (bgraph_w, scores, intermediate, aux), _ = model.apply(
        variables, batch.x, batch.graph, node_mask=batch.node_mask,
        training=True, mutable=list(wb))
    emb = jax.lax.stop_gradient(intermediate)
    sc_warm = float(aux["score_cut"])
    n_clusters_warm = int(aux["n_clusters"])

    from hierarchicalgnn_tpu.ops import gmm as gmm_ops
    from hierarchicalgnn_tpu.ops.sddmm import edge_cosine_likelihood
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import build_sorted_plan
    from hierarchicalgnn_tpu.ops.connected import (
        cluster_labels_sorted, connected_components_sorted)

    hp = dict(BASE_OVERRIDES)
    graph = batch.graph
    n = batch.x.shape[0]
    plan = build_sorted_plan(graph.senders, graph.receivers, graph.edge_mask,
                             n)
    # the model's work graph is receiver-sorted; rebuild the warm keep mask
    lik = edge_cosine_likelihood(emb, plan.senders_sorted,
                                 plan.receivers_sorted,
                                 mask=plan.edge_mask_sorted)
    g2 = gmm_ops.fit_gmm2(lik, plan.edge_mask_sorted, iters=60)
    cut, _ = gmm_ops.solve_cut(g2, 5.0)
    sc = sc_warm if np.isfinite(sc_warm) else float(cut)
    keep = np.asarray(plan.edge_mask_sorted & (lik >= sc))
    keep_frac = float(keep.sum() / max(np.asarray(plan.edge_mask_sorted).sum(), 1))
    results["keep_frac"] = round(keep_frac, 4)
    keep = jnp.asarray(keep)

    interp = jax.default_backend() != "tpu"

    def cc_op(k):
        def body(i, acc):
            km = keep & (lik + i.astype(jnp.float32) * 1e-20 >= sc)
            labels = connected_components_sorted(plan, km, n,
                                                 node_mask=batch.node_mask,
                                                 interpret=interp)
            return acc + labels[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["cc_warm_ms"] = round(timed(cc_op, args.iters) * 1e3, 2)
    print(f"{'cc_warm':28s} {results['cc_warm_ms']:8.1f} ms", flush=True)

    def cluster_op(k):
        def body(i, acc):
            km = keep & (lik + i.astype(jnp.float32) * 1e-20 >= sc)
            cl, nc = cluster_labels_sorted(plan, km, n, min_cluster_size=3,
                                           node_mask=batch.node_mask,
                                           interpret=interp)
            return acc + nc.astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["cluster_labels_warm_ms"] = round(
        timed(cluster_op, args.iters) * 1e3, 2)
    print(f"{'cluster_labels_warm':28s} "
          f"{results['cluster_labels_warm_ms']:8.1f} ms", flush=True)

    # CC iteration count at warm state (instrumented copy of the loop)
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        sorted_segment_min_i32)
    int_max = jnp.iinfo(jnp.int32).max
    s, r = plan.senders_sorted, plan.receivers_sorted

    @jax.jit
    def cc_iters(keep_mask):
        labels0 = jnp.arange(n, dtype=jnp.int32)

        def hop(labels):
            l_edge = jnp.minimum(labels[s], labels[r])
            l_edge = jnp.where(keep_mask, l_edge, int_max)
            m = sorted_segment_min_i32(l_edge, plan, interp)
            new = jnp.minimum(labels, m)
            for _ in range(3):
                new = jnp.minimum(new, new[new])
            return new

        def body(state):
            labels, _, it = state
            new = hop(hop(labels))
            return new, jnp.any(new != labels), it + 1

        def cond(state):
            _, changed, it = state
            return changed & (it < 32)

        _, _, it = jax.lax.while_loop(cond, body,
                                      (labels0, jnp.asarray(True), 0))
        return it

    results["cc_warm_while_iters"] = int(cc_iters(keep))
    results["n_clusters_warm"] = n_clusters_warm
    print(f"cc_warm_while_iters={results['cc_warm_while_iters']} "
          f"n_clusters={n_clusters_warm} keep_frac={keep_frac:.3f}",
          flush=True)

    # --- full matching truth (auction) on the real warm scores ---
    from hierarchicalgnn_tpu.train.matching import (
        match_particles_to_candidates)
    sc_scores = jax.lax.stop_gradient(scores)
    nc = jnp.int32(n_clusters_warm)

    # dump the warm pair-score matrix for offline auction diagnosis
    from hierarchicalgnn_tpu.ops.segment import segment_sum as _segsum
    p_max = batch.particle_pid.shape[0]
    c_max = hp["max_clusters"]
    part_of_edge = batch.pid_compact[bgraph_w.senders]
    flat = part_of_edge * c_max + bgraph_w.receivers
    pair_scores = _segsum(
        jnp.where(bgraph_w.edge_mask, sc_scores, 0.0), flat,
        p_max * c_max).reshape(p_max, c_max)
    np.savez("/tmp/warm_matching.npz", pair_scores=np.asarray(pair_scores),
             n_particles=int(batch.n_particles),
             n_clusters=n_clusters_warm)
    print("dumped /tmp/warm_matching.npz", flush=True)

    def matching_op(k):
        def body(i, acc):
            truth, _, _, _ = match_particles_to_candidates(
                sc_scores * (1.0 + i.astype(jnp.float32) * 1e-6),
                bgraph_w.senders, bgraph_w.receivers, bgraph_w.edge_mask,
                batch.pid_compact, batch.particle_pid, batch.n_particles,
                nc, hp["max_clusters"])
            return acc + jnp.sum(truth.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["matching_warm_ms"] = round(
        timed(matching_op, args.iters) * 1e3, 2)
    print(f"{'matching_warm':28s} {results['matching_warm_ms']:8.1f} ms",
          flush=True)

    # --- round-5: replicated remainder under the POOLED partition ---
    # Everything that still runs identically on every device once
    # shard_pooled row-blocks the supernode space (parallel/
    # graph_shard.py): GMM-EM + cut, the C x C super-kNN + symmetrize,
    # the edge-partition argsorts, the CC pointer-jump/convergence
    # residue, and the replicated loss (incl. matching).  The sum feeds
    # scripts/collective_audit.py --replicated-ms (the rho=measured row).
    from hierarchicalgnn_tpu.models.blocks import l2_normalize
    from hierarchicalgnn_tpu.ops.graph import symmetrize
    from hierarchicalgnn_tpu.ops.knn import knn as knn_query
    from hierarchicalgnn_tpu.ops.knn import knn_to_edges
    from hierarchicalgnn_tpu.ops.graph import Graph as _Graph
    from hierarchicalgnn_tpu.ops.segment import segment_mean
    from hierarchicalgnn_tpu.parallel.graph_shard import (
        SpmdSpec, partition_edges)

    def gmm_op(k):
        def body(i, acc):
            g2 = gmm_ops.fit_gmm2(lik * (1.0 + i.astype(jnp.float32) * 1e-9),
                                  plan.edge_mask_sorted, iters=60)
            cut, _ = gmm_ops.solve_cut(g2, 5.0)
            return acc + cut
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["gmm_cut_ms"] = round(timed(gmm_op, args.iters) * 1e3, 2)
    print(f"{'gmm_cut':28s} {results['gmm_cut_ms']:8.1f} ms", flush=True)

    clusters_w = aux["clusters"]
    in_cl = clusters_w >= 0
    seg_w = jnp.where(in_cl, clusters_w, 0)
    means_w = l2_normalize(segment_mean(emb, seg_w, hp["max_clusters"],
                                        mask=in_cl))
    cval = jnp.arange(hp["max_clusters"]) < jnp.int32(n_clusters_warm)
    means_w = jnp.where(cval[:, None], means_w, 0.0)

    def superknn_op(k):
        def body(i, acc):
            m2 = means_w * (1.0 + i.astype(jnp.float32) * 1e-9)
            idx, d2 = knn_query(m2, m2, 10, 2.0, q_mask=cval, p_mask=cval,
                                block_size=hp.get("knn_block_size", 1024))
            s_, r_, em = knn_to_edges(idx)
            sg = symmetrize(_Graph(s_, r_, em))
            return acc + jnp.sum(sg.edge_mask.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["super_knn_ms"] = round(timed(superknn_op, args.iters) * 1e3, 2)
    print(f"{'super_knn':28s} {results['super_knn_ms']:8.1f} ms", flush=True)

    spec8 = SpmdSpec(n_parts=8)

    def partition_op(k):
        def body(i, acc):
            g8 = _Graph(graph.senders,
                        graph.receivers + (0 * i).astype(jnp.int32), graph.edge_mask)
            parts, slot, ok = partition_edges(g8, n, spec8)
            return acc + slot[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["partition_edges_ms"] = round(
        timed(partition_op, args.iters) * 1e3, 2)
    print(f"{'partition_edges(x1 of 2)':28s} "
          f"{results['partition_edges_ms']:8.1f} ms", flush=True)

    jump_iters = 2 * max(results.get("cc_warm_while_iters", 4), 1)

    def jump_op(k):
        def body(i, acc):
            l = jnp.arange(n, dtype=jnp.int32) + (0 * i).astype(jnp.int32)

            def one(j, lab):
                for _ in range(3):
                    lab = jnp.minimum(lab, lab[lab])
                return jnp.where(jnp.any(lab != l), lab, lab)

            l = jax.lax.fori_loop(0, jump_iters, one, l)
            return acc + l[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["cc_jump_residue_ms"] = round(
        timed(jump_op, args.iters) * 1e3, 2)
    print(f"{'cc_jump_residue':28s} "
          f"{results['cc_jump_residue_ms']:8.1f} ms", flush=True)

    def loss_op(k):
        def body(i, acc):
            # i-dependent scores so XLA cannot hoist the loss out of the loop
            out_i = (bgraph_w, scores * (1.0 + i.astype(jnp.float32) * 1e-9),
                     intermediate, aux)
            loss, _ = pipeline.loss_from_outputs(out_i, batch, 0)
            return acc + loss
        return jax.lax.fori_loop(0, k, body, 0.0)

    results["loss_replicated_ms"] = round(
        timed(loss_op, args.iters) * 1e3, 2)
    print(f"{'loss_replicated(incl match)':28s} "
          f"{results['loss_replicated_ms']:8.1f} ms", flush=True)

    compact_ms = max(results["cluster_labels_warm_ms"]
                     - results["cc_warm_ms"], 0.0)
    results["pooled_replicated_remainder_ms"] = round(
        results["gmm_cut_ms"] + results["super_knn_ms"]
        + 2 * results["partition_edges_ms"] + results["cc_jump_residue_ms"]
        + results["loss_replicated_ms"] + compact_ms, 2)
    print(f"{'POOLED REPLICATED REMAINDER':28s} "
          f"{results['pooled_replicated_remainder_ms']:8.1f} ms", flush=True)

    print(json.dumps({"dtype": args.dtype or "float32",
                      "warmup": args.warmup, "results": results}))


if __name__ == "__main__":
    main()
