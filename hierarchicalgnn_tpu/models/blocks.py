"""Model blocks: interaction stack and hierarchical (pooling) stack.

The reference copy-pastes ``InteractionGNNBlock`` and
``HierarchicalGNNBlock`` into each pipeline with small deltas (survey §1
note; e.g. 1-norm supernode init only in BC/gMRT:
``Modules/BipartiteClassification/Models/HGNN_GMM.py:269`` vs
``Modules/GNNEmbedding/Models/HGNN_GMM.py:256``).  Here each block exists
once, parameterized by those deltas.

The hierarchical block's GMM edge-cut pooling -- sklearn GMM fit + scipy
fsolve + cuGraph connected components in the reference
(``.../HGNN_GMM.py:184-234``) -- runs fully on device inside jit:
masked EM (:mod:`ops.gmm`), bisection cut, min-label-propagation CC
(:mod:`ops.connected`), with the ``score_cut`` EMA buffer as mutable
module state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hierarchicalgnn_tpu.ops import gmm as gmm_ops
from hierarchicalgnn_tpu.ops.connected import cluster_labels
from hierarchicalgnn_tpu.ops.graph import Graph
from hierarchicalgnn_tpu.ops.sddmm import (
    cosine_from_endpoints, edge_cosine_likelihood, normalize_unit_f32)
from hierarchicalgnn_tpu.ops.segment import (
    make_aggregator, segment_mean, segment_sum)
from hierarchicalgnn_tpu.models.cells import HierarchicalGNNCell, InteractionGNNCell
from hierarchicalgnn_tpu.models.dynamic_graph import DynamicGraphConstruction
from hierarchicalgnn_tpu.models.mlp import MLP, MatchDims, maybe_remat
from hierarchicalgnn_tpu.utils.config import ArchConfig


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch ``F.normalize`` numerics (x / max(||x||, eps)) in a form whose
    gradient is finite at x == 0: padded rows are exactly zero, and the
    norm's gradient at zero is NaN, which would poison the whole backward
    pass through masked (0-weight) loss terms (0 * NaN = NaN)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def l1_normalize(x, axis=-1, eps=1e-12):
    n = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def sorted_graph_mode(graph: Graph, num_segments: int):
    """Receiver-sort a graph for the zero-gather Pallas aggregation path.

    Returns (work_graph, agg, plan): the graph re-expressed in sorted order
    (edge tensors created from it are then aggregation-ready with no
    per-iteration gather) and the shared aggregator.  See
    ops/pallas/sorted_agg.py.
    """
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, build_transposed_plan, gather_edge_endpoints,
        sorted_aggregate,
    )

    plan = build_sorted_plan(graph.senders, graph.receivers, graph.edge_mask,
                             num_segments)
    plan_t, r2s = build_transposed_plan(plan, graph.senders, graph.receivers,
                                        graph.edge_mask, num_segments)
    work_graph = Graph(plan.senders_sorted, plan.receivers_sorted,
                       plan.edge_mask_sorted)
    interpret = jax.default_backend() != "tpu"
    agg = lambda d: sorted_aggregate(d, plan, interpret)
    gather = lambda x: gather_edge_endpoints(x, plan, plan_t, r2s, interpret)
    return work_graph, agg, gather, plan


class InteractionGNNBlock(nn.Module):
    """Node/edge encoders + N interaction cells [+ embedding head].

    (reference ``Modules/BipartiteClassification/Models/HGNN_GMM.py:23-99``,
    ``Modules/EdgeClassifier/Models/IN.py:15-95``)
    """

    cfg: ArchConfig
    iterations: int
    emb: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, agg=None, gather=None,
                 encode_gather=None):
        """``graph`` may be a receiver-sorted work graph with ``agg`` its
        shared sorted aggregator (built at the model level so the
        hierarchical block can reuse the same ordering).

        ``encode_gather``: endpoint feature gather for the edge encoder
        input; defaults to direct indexing.  Under graph partitioning
        (parallel/graph_shard.py) this is the halo gather -- senders live
        on other devices."""
        cfg = self.cfg
        node_encoder = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_node_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        edge_encoder = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_edge_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)

        nodes = node_encoder(x)
        if encode_gather is None:
            x_src, x_dst = x[graph.senders], x[graph.receivers]
        else:
            x_src, x_dst = encode_gather(x)
        edges = edge_encoder(jnp.concatenate([x_src, x_dst], -1))
        # bf16 data path: the node/edge residual streams, gathers, concats
        # and aggregations all run at half the HBM traffic; heads cast back.
        if cfg.compute_dtype:
            nodes = nodes.astype(cfg.compute_dtype)
            edges = edges.astype(cfg.compute_dtype)

        # One aggregation plan for all iterations.
        if agg is None:
            agg = make_aggregator(graph.receivers, graph.edge_mask,
                                  x.shape[0])
        if cfg.share_weight:
            cell = InteractionGNNCell(self.cfg)
            for _ in range(self.iterations):
                nodes, edges = cell(nodes, edges, graph, agg=agg,
                                    gather=gather)
        else:
            for _ in range(self.iterations):
                nodes, edges = InteractionGNNCell(self.cfg)(
                    nodes, edges, graph, agg=agg, gather=gather)

        if not self.emb:
            return nodes, edges
        # The embedding head computes in f32 even on the bf16 data path
        # (compute_dtype=None; like the score heads, the head leaves the
        # bf16 path).  bf16-VALUED embeddings collide exactly once
        # same-track hits converge within bf16 quantization; the collided
        # pairs' cosine is exactly 1, piling a delta spike at the atanh
        # clamp that the clustering GMM then fits -- the score_cut EMA pins
        # at atanh(1-1e-7)=8.38 and clustering collapses (epoch ~90 of
        # runs/bc_pallas_bf16_long).  A cast AFTER a bf16 head cannot undo
        # the collision; the head itself must be the f32 island.
        # (cfg.emb_head_dtype="bfloat16" re-opens the collision path for
        # ablation runs only -- see the seed study in docs/DESIGN.md.)
        output_layer = MLP(
            hidden_size=cfg.hidden, output_size=cfg.emb_dim,
            hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
            output_activation=None,
            hidden_activation=cfg.hidden_output_activation,
            compute_dtype=cfg.emb_head_dtype)
        embeddings = l2_normalize(output_layer(nodes).astype(jnp.float32))
        return embeddings, nodes, edges


class HierarchicalGNNBlock(nn.Module):
    """GMM pooling -> dynamic super/bipartite graphs -> N hierarchical cells.

    Variant deltas (survey §1):
      * ``l1_norm_supernode_init``: BC/gMRT normalize node features with a
        1-norm before the supernode init aggregation (BC ``HGNN_GMM.py:269``).
      * ``emb_output``: the Embedding pipeline adds a final embedding head
        and returns (embeddings, clusters) (GNNEmbedding ``HGNN_GMM.py:273-276``);
        BC/gMRT return (nodes, supernodes, bipartite graph).
    """

    cfg: ArchConfig
    l1_norm_supernode_init: bool = True
    emb_output: bool = False

    def clustering(self, score_cut_var, embeddings, graph: Graph, node_mask,
                   training: bool, plan=None, shard=None,
                   endpoint_gather=None):
        """GMM edge-cut + connected components (reference ``HGNN_GMM.py:184-238``).

        Runs under stop-gradient; updates the ``score_cut`` EMA buffer.
        ``plan``: the flat graph's SortedPlan (Pallas mode) -- CC then uses
        the blocked-CSR VPU min kernel instead of scatter-min hops.
        ``shard``: pooled-space partition -- ``graph`` is then this
        device's receiver-partitioned edge slice (GLOBAL ids): the edge
        likelihood computes on local edges only (1/P the SDDMM work), the
        GMM fits replicated on the all-gathered likelihood (identical
        moments, per-device order), and CC runs partitioned
        (``parallel.graph_shard.sharded_cluster_labels``).
        Returns (clusters int32[N] with -1 fill, n_clusters).
        """
        cfg = self.cfg
        emb = jax.lax.stop_gradient(embeddings)
        if endpoint_gather is not None:
            # kernel-backed cosine: the [E, d] endpoint rows come from the
            # sorted-plan one-hot MXU gather (the XLA row-gather form
            # measured 178M edges/s vs 466M for the sorted-native SDDMM,
            # round-4 bench) -- the dot is a fused VPU multiply-reduce.
            x_s, x_r = endpoint_gather()
            likelihood = cosine_from_endpoints(x_s, x_r,
                                               mask=graph.edge_mask)
        else:
            likelihood = edge_cosine_likelihood(
                emb, graph.senders, graph.receivers, mask=graph.edge_mask)
        if shard is not None:
            lik_fit = shard.all_gather(likelihood)
            mask_fit = shard.all_gather(graph.edge_mask)
        else:
            lik_fit, mask_fit = likelihood, graph.edge_mask
        gmm = gmm_ops.fit_gmm2(lik_fit, mask_fit, iters=cfg.gmm_iters)

        # score_cut buffer: +inf until first fit, then EMA momentum 0.95.
        sc = score_cut_var.value[0]
        sc = jnp.where(jnp.isinf(sc), jnp.mean(gmm.means), sc)
        cut, valid = gmm_ops.solve_cut(gmm, cfg.cluster_granularity)
        momentum = 0.95
        new_sc = jnp.where(valid, momentum * sc + (1 - momentum) * cut, sc)
        if training and not self.is_initializing():
            score_cut_var.value = new_sc[None]
        sc_used = new_sc if training else sc

        keep = graph.edge_mask & (likelihood >= sc_used)
        n = embeddings.shape[0]
        if shard is not None:
            from hierarchicalgnn_tpu.parallel.graph_shard import (
                sharded_cluster_labels)

            def cluster(mask):
                return sharded_cluster_labels(
                    shard, mask, n, min_cluster_size=cfg.min_cluster_size,
                    node_mask=node_mask)
        elif plan is not None:
            from hierarchicalgnn_tpu.ops.connected import cluster_labels_sorted
            interp = jax.default_backend() != "tpu"

            def cluster(mask):
                return cluster_labels_sorted(
                    plan, mask, n, min_cluster_size=cfg.min_cluster_size,
                    node_mask=node_mask, interpret=interp)
        else:
            def cluster(mask):
                return cluster_labels(
                    graph.senders, graph.receivers, mask, n,
                    min_cluster_size=cfg.min_cluster_size,
                    node_mask=node_mask, bidirected=True)

        clusters, n_clusters = cluster(keep)

        # Over-cut fallback: <=3 clusters -> recluster on the full graph
        # (reference ``HGNN_GMM.py:222-232``).  lax.cond so the second
        # connected-components pass only runs when actually needed.
        clusters, n_clusters = jax.lax.cond(
            n_clusters <= 3, lambda _: cluster(graph.edge_mask),
            lambda _: (clusters, n_clusters), None)
        return clusters, n_clusters

    @nn.compact
    def __call__(self, embeddings, nodes, edges, graph: Graph,
                 node_mask=None, training: bool = False, agg=None,
                 gather=None, plan=None, shard=None):
        """``shard``: a ``parallel.graph_shard.ShardTools`` when running
        graph-partitioned inside shard_map.  Node-space inputs
        (embeddings/nodes/node_mask) are then LOCAL row blocks and ``graph``
        is the local receiver-partitioned edge slice; the pooled space
        (clustering, GMM, means, dynamic graphs, supernode/superedge
        updates) computes replicated from all-gathered embeddings.  The
        module/param structure is identical either way, so checkpoints
        interchange between the single-chip and partitioned paths."""
        cfg = self.cfg
        n = nodes.shape[0]
        if node_mask is None:
            node_mask = jnp.ones((n,), bool)
        if shard is not None:
            from hierarchicalgnn_tpu.parallel.graph_shard import pooled_active

            # pooled-space partition (supernode rows blocked over the graph
            # axis) unless disabled / indivisible -- see graph_shard.py
            pooled = pooled_active(shard.spec, cfg.max_clusters)
            # global embedding/mask views for the replicated pooled phases
            emb_global = shard.all_gather(embeddings)
            mask_global = shard.all_gather(node_mask)
        else:
            pooled = False
            emb_global, mask_global = embeddings, node_mask
        n_global = emb_global.shape[0]

        score_cut = self.variable(
            "buffers", "score_cut", lambda: jnp.full((1,), jnp.inf, jnp.float32))

        supernode_encoder = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent - cfg.emb_dim,
            hidden_layers=cfg.nb_node_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        superedge_encoder = maybe_remat(MLP, cfg)(
            hidden_size=cfg.hidden, output_size=cfg.latent,
            hidden_layers=cfg.nb_edge_layer, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation,
            hidden_activation=cfg.hidden_activation,
            compute_dtype=cfg.compute_dtype)
        super_graph_construction = DynamicGraphConstruction(
            "sigmoid", k=cfg.supergraph_sparsity, sym=True, norm=True,
            knn_block_size=cfg.knn_block_size)
        bipartite_graph_construction = DynamicGraphConstruction(
            "exp", k=cfg.bipartitegraph_sparsity, sym=False, norm=True,
            return_logits=True, knn_block_size=cfg.knn_block_size,
            # pooled partition: the bipartite kNN is query-sharded (each
            # device mines its own node rows against the replicated means);
            # batch-norm moments / radius EMA / weight normalization then
            # reduce across the axis for exact-parity statistics.
            axis_name=(shard.spec.axis if pooled else None))

        # --- pooling (replicated across the graph axis when sharded) ---
        if shard is not None and pooled:
            # partitioned clustering: local-edge likelihood (kernel-backed
            # endpoint gather in Pallas mode) + sharded CC
            clusters, n_clusters = self.clustering(
                score_cut, emb_global, shard.local_graph, mask_global,
                training, shard=shard,
                endpoint_gather=lambda: shard.gather(
                    normalize_unit_f32(jax.lax.stop_gradient(embeddings))))
        elif shard is not None:
            if shard.spec.use_pallas:
                # Sorted-native CC for the replicated pooled space too: a
                # full-graph plan built once per forward feeds the blocked-
                # CSR VPU-min hop (the scatter-min fallback measured ~30x
                # slower at TrackML scale -- docs/DESIGN.md CC table).
                from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
                    build_sorted_plan)
                fg = shard.full_graph
                fplan = build_sorted_plan(fg.senders, fg.receivers,
                                          fg.edge_mask, n_global)
                fgraph = Graph(fplan.senders_sorted, fplan.receivers_sorted,
                               fplan.edge_mask_sorted)
                clusters, n_clusters = self.clustering(
                    score_cut, emb_global, fgraph, mask_global,
                    training, plan=fplan)
            else:
                clusters, n_clusters = self.clustering(
                    score_cut, emb_global, shard.full_graph, mask_global,
                    training, plan=None)
        else:
            eg = None
            if gather is not None and plan is not None:
                eg = lambda: gather(
                    normalize_unit_f32(jax.lax.stop_gradient(embeddings)))
            clusters, n_clusters = self.clustering(
                score_cut, embeddings, graph, node_mask, training, plan=plan,
                endpoint_gather=eg)
        in_cluster = clusters >= 0
        seg = jnp.where(in_cluster, clusters, 0)
        if pooled:
            # cluster means from LOCAL rows + one psum of the [C, emb]
            # partial moments (same sums as the replicated segment_mean,
            # per-device summation order)
            cl_loc = jax.lax.dynamic_slice_in_dim(
                clusters, shard.index * shard.n_local, shard.n_local, 0)
            icl = cl_loc >= 0
            seg_l = jnp.where(icl, cl_loc, 0)
            total = segment_sum(embeddings, seg_l, cfg.max_clusters,
                                mask=icl)
            cnt = segment_sum(jnp.ones(embeddings.shape[:1],
                                       embeddings.dtype),
                              seg_l, cfg.max_clusters, mask=icl)
            total = jax.lax.psum(total, shard.spec.axis)
            cnt = jax.lax.psum(cnt, shard.spec.axis)
            means = total / jnp.maximum(cnt, 1)[:, None]
        else:
            means = segment_mean(emb_global, seg, cfg.max_clusters,
                                 mask=in_cluster)
        means = l2_normalize(means)
        cluster_valid = jnp.arange(cfg.max_clusters) < n_clusters
        means = jnp.where(cluster_valid[:, None], means, 0.0)

        # --- dynamic graphs over the pooled space ---
        super_graph, super_weights = super_graph_construction(
            means, means, training, src_mask=cluster_valid,
            dst_mask=cluster_valid)
        if pooled:
            # query-sharded: this device mines its own node rows; the
            # result IS the device's sender-contiguous bipartite block
            bipartite_graph, bipartite_weights, _ = (
                bipartite_graph_construction(
                    embeddings, means, training, src_mask=node_mask,
                    dst_mask=cluster_valid))
        else:
            bipartite_graph, bipartite_weights, _ = (
                bipartite_graph_construction(
                    emb_global, means, training, src_mask=mask_global,
                    dst_mask=cluster_valid))

        # Shared aggregation plans for init + all hierarchical iterations.
        # In sorted-native mode each direction gets its own receiver-sorted
        # copy of the dynamic edge lists (structure + weights are fresh per
        # forward, so the sorts replace -- not add to -- data movement).
        gathers = None
        if shard is not None:
            # Shard-aware aggregation: local flat edges, contiguous local
            # bipartite slice + one psum into the replicated supernode
            # space, halo gather for the edge update.
            from hierarchicalgnn_tpu.parallel.graph_shard import (
                make_hier_shard_aggs)

            # Pallas mode re-expresses the replicated super graph in
            # receiver-sorted order -- downstream superedge init/gathers
            # must use the returned graph/weights.  Pooled mode returns the
            # LOCAL receiver-partitioned superedge slice instead.
            aggs, gathers, super_graph, super_weights, _ = (
                make_hier_shard_aggs(
                    shard, bipartite_graph, bipartite_weights,
                    super_graph, super_weights, cfg.max_clusters,
                    cfg.bipartitegraph_sparsity))
        elif cfg.use_pallas:
            from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
                build_sorted_plan, build_transposed_plan,
                gather_edge_endpoints, sorted_aggregate_weighted,
            )
            interp = jax.default_backend() != "tpu"
            s_plan = build_sorted_plan(
                super_graph.senders, super_graph.receivers,
                super_graph.edge_mask, cfg.max_clusters)
            s_plan_t, s_r2s = build_transposed_plan(
                s_plan, super_graph.senders, super_graph.receivers,
                super_graph.edge_mask, cfg.max_clusters)
            super_graph = Graph(s_plan.senders_sorted, s_plan.receivers_sorted,
                                s_plan.edge_mask_sorted)
            super_weights = s_plan.sort(super_weights)
            b1 = build_sorted_plan(
                bipartite_graph.senders, bipartite_graph.receivers,
                bipartite_graph.edge_mask, cfg.max_clusters)
            b2 = build_sorted_plan(
                bipartite_graph.receivers, bipartite_graph.senders,
                bipartite_graph.edge_mask, n)
            w1 = b1.sort(bipartite_weights)
            w2 = b2.sort(bipartite_weights)
            bipartite_graph = Graph(b1.senders_sorted, b1.receivers_sorted,
                                    b1.edge_mask_sorted)
            bipartite_weights = w1
            # Weighted aggregators: the per-edge weight rides inside the
            # one-hot MXU matmul (no materialized data*w edge tensor).
            aggs = {
                "edge_to_node": agg or make_aggregator(
                    graph.receivers, graph.edge_mask, n),
                "bip_to_super": (
                    lambda d: sorted_aggregate_weighted(d, w1, b1, interp),
                    b1.senders_sorted),
                "bip_to_node": (
                    lambda d: sorted_aggregate_weighted(d, w2, b2, interp),
                    b2.senders_sorted),
                "super_to_super": lambda d: sorted_aggregate_weighted(
                    d, super_weights, s_plan, interp),
            }
            gathers = {
                "graph": (gather if gather is not None
                          else (lambda x: (x[graph.senders],
                                           x[graph.receivers]))),
                "super": lambda x: gather_edge_endpoints(
                    x, s_plan, s_plan_t, s_r2s, interp),
            }
        else:
            def weighted(aggfn, w):
                return lambda d: aggfn(d * w)

            aggs = {
                "edge_to_node": agg or make_aggregator(
                    graph.receivers, graph.edge_mask, n),
                "bip_to_super": (weighted(make_aggregator(
                    bipartite_graph.receivers, bipartite_graph.edge_mask,
                    cfg.max_clusters), bipartite_weights),
                    bipartite_graph.senders),
                "bip_to_node": (weighted(make_aggregator(
                    bipartite_graph.senders, bipartite_graph.edge_mask, n),
                    bipartite_weights),
                    bipartite_graph.receivers),
                "super_to_super": weighted(make_aggregator(
                    super_graph.receivers, super_graph.edge_mask,
                    cfg.max_clusters), super_weights),
            }

        # --- supernode / superedge initialization ---
        init_nodes = l1_normalize(nodes) if self.l1_norm_supernode_init else nodes
        agg_to_super, b_send = aggs["bip_to_super"]
        agg_init = agg_to_super(init_nodes[b_send]).astype(nodes.dtype)
        means_rows = means
        if pooled:
            c_local = cfg.max_clusters // shard.spec.n_parts
            means_rows = jax.lax.dynamic_slice_in_dim(
                means, shard.index * c_local, c_local, 0)
        supernodes = jnp.concatenate(
            [means_rows.astype(nodes.dtype), supernode_encoder(agg_init)], -1)
        # super_bcast: identity unless the pooled space is row-blocked, in
        # which case it all_gathers the local rows back to the replicated
        # [max_clusters, D] view for endpoint indexing (global ids).
        sbc = (gathers.get("super_bcast", lambda x: x) if gathers
               else (lambda x: x))
        sn_all = sbc(supernodes)
        superedges = superedge_encoder(jnp.concatenate(
            [sn_all[super_graph.senders],
             sn_all[super_graph.receivers]], -1))

        # --- hierarchical message passing ---
        if cfg.share_weight:
            cell = HierarchicalGNNCell(cfg)
            cells = [cell] * cfg.n_hierarchical_graph_iters
        else:
            cells = [HierarchicalGNNCell(cfg)
                     for _ in range(cfg.n_hierarchical_graph_iters)]
        for cell in cells:
            nodes, edges, supernodes, superedges = cell(
                nodes, edges, supernodes, superedges, graph,
                (bipartite_graph, bipartite_weights),
                (super_graph, super_weights), aggs=aggs, gathers=gathers)

        aux = {"clusters": clusters, "n_clusters": n_clusters,
               "cluster_valid": cluster_valid,
               "score_cut": score_cut.value[0]}

        if self.emb_output:
            # f32 island like the IN-block embedding head (see there): the
            # final embeddings feed hinge distances and HDBSCAN clustering.
            # cfg.emb_head_dtype covers BOTH embedding heads so the bf16-
            # heads ablation variant is complete for the embedding pipelines.
            output_layer = MLP(
                hidden_size=cfg.hidden, output_size=cfg.emb_dim,
                hidden_layers=cfg.output_layers, layer_norm=cfg.layernorm,
                output_activation=None,
                hidden_activation=cfg.hidden_output_activation,
                compute_dtype=cfg.emb_head_dtype)
            out_embeddings = l2_normalize(
                output_layer(nodes).astype(jnp.float32))
            return out_embeddings, aux
        # Pooled mode: hand the score heads the replicated supernode view
        # (they index it by arbitrary cluster id); the bipartite graph stays
        # this device's sender-contiguous block (models globalize senders).
        return nodes, sbc(supernodes), (bipartite_graph, bipartite_weights), aux


class GMRTEncoders(nn.Module):
    """gMRT minimal encoders: single Dense layers instead of the deep IN
    block (reference ``Modules/gMRT/Models/HGNN_GMM.py:292-313``)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, x, graph: Graph, encode_gather=None):
        cfg = self.cfg
        node_encoder = maybe_remat(MatchDims, cfg)(
            output_size=cfg.latent, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation)
        edge_encoder = maybe_remat(MatchDims, cfg)(
            output_size=cfg.latent, layer_norm=cfg.layernorm,
            output_activation=cfg.hidden_activation)
        output_layer = MatchDims(
            output_size=cfg.emb_dim, layer_norm=cfg.layernorm,
            output_activation=None)

        nodes = node_encoder(x)
        if encode_gather is None:
            x_src, x_dst = x[graph.senders], x[graph.receivers]
        else:
            x_src, x_dst = encode_gather(x)
        edges = edge_encoder(jnp.concatenate([x_src, x_dst], -1))
        embeddings = l2_normalize(output_layer(nodes).astype(jnp.float32))
        if cfg.compute_dtype:
            nodes = nodes.astype(cfg.compute_dtype)
            edges = edges.astype(cfg.compute_dtype)
        return embeddings, nodes, edges
