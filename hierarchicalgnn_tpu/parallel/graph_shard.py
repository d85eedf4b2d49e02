"""Graph-partitioned execution of the PRODUCTION models under shard_map.

This is the halo path for the real model family (the round-1
``parallel/halo.py`` proved the collective schedule on bespoke MLP stacks;
here the same schedule drives ``models/cells.py`` and the shipped flax
modules, so multi-chip training uses the exact parameters, buffers and
numerics of the single-chip models).  Reference scope: the hot loops being
partitioned are the reference's cell iterations
(``/root/reference/Modules/gnn_utils.py:17-169``) -- the BASELINE north
star's edge-partitioned full-detector-event scaling target.

Partitioning scheme (one event across the mesh ``graph`` axis):

  * **Node space row-blocked**: device d owns global node rows
    ``[d*n_local, (d+1)*n_local)``.  Node-indexed arrays enter shard_map
    with ``P('graph')`` on the node axis.
  * **Flat edges receiver-partitioned**: every directed edge lives on the
    device owning its receiver, so edge->node aggregation is purely local.
    The partition is computed on device (replicated argsort by receiver +
    slice) because the padded edge list is event-data, not static -- see
    :func:`partition_edges`.  Per-device capacity is
    ``ceil(E * slack / n_parts)`` (lane-aligned); an ``ok`` flag reports
    overflow (edges dropped) instead of silently corrupting.
  * **Halo**: sender-side node features are refreshed once per
    message-passing iteration via ``lax.all_gather`` over the axis -- the
    ring collective rides ICI.  (The Pallas bidirectional-ring RDMA gather
    from ``ops/pallas/ring_gather.py`` drops in here; the XLA collective is
    the default because it interprets everywhere.)
  * **Pooled space row-blocked too** (``shard_pooled``, default on --
    round 5; replicating it capped the 8-chip Amdahl projection at ~70%):
    supernode rows split like node rows (``psum_scatter`` completes the
    bipartite node->supernode reduction; one small ``all_gather([C, D])``
    rebuilds the replicated view per use), superedges receiver-partition
    over the supernode blocks, connected components hop on local edges
    with one ``all_gather([n_local])`` per hop, and the bipartite kNN is
    query-sharded with psum'd batch-norm moments.  Replicated remainder:
    GMM-EM + cut, the C x C super-kNN, the partition argsorts, and the
    loss (incl. auction matching).  ``shard_pooled: false`` restores the
    fully replicated pooled layout.
  * **Bipartite edges sender-block contiguous**: kNN construction emits
    ``senders = repeat(arange(N), k)`` (ops/knn.py:knn_to_edges), so device
    d's bipartite edges are exactly the static slice
    ``[d*n_local*k, (d+1)*n_local*k)`` -- no routing step needed (and the
    query-sharded kNN emits exactly this device's block directly).

The cells stay untouched: all shard awareness is injected through their
``agg``/``gather``/``aggs``/``gathers`` parameters, which is why the param
tree (and therefore every checkpoint) is identical between the sharded and
unsharded paths.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from hierarchicalgnn_tpu.ops.graph import Graph
from hierarchicalgnn_tpu.ops.segment import segment_sum


class SpmdSpec(NamedTuple):
    """Static descriptor threading the mesh axis through the model forward."""

    axis: str = "graph"
    n_parts: int = 1
    slack: float = 1.5      # per-device edge capacity head-room
    use_pallas: bool = False
    halo_backend: str = "xla"   # "xla" (lax.all_gather) | "rdma" (Pallas ring)
    # Row-block the POOLED space too (supernodes, superedges, connected
    # components, bipartite kNN) instead of replicating it.  The replicated
    # pooled fraction is what capped the 8-chip Amdahl projection at ~70%
    # (round-4 collective audit); with it partitioned only GMM/cut, the
    # super-kNN and the auction stay replicated.  Requires
    # ``max_clusters % n_parts == 0`` (see :func:`pooled_active`).
    shard_pooled: bool = True


def pooled_active(spec: "SpmdSpec", max_clusters: int) -> bool:
    """Whether the pooled-space partition is in effect (STATIC decision:
    both operands are trace-time constants, and the model out_specs must
    agree with it)."""
    return bool(spec.shard_pooled) and max_clusters % spec.n_parts == 0


class ShardTools(NamedTuple):
    """Per-device handles built once per forward inside shard_map."""

    spec: SpmdSpec
    index: jnp.ndarray          # this device's position on the axis
    n_local: int                # owned node rows
    full_graph: Graph           # replicated full directed graph (global ids)
    local_graph: Graph          # owned edges (senders/receivers GLOBAL ids)
    slot: jnp.ndarray           # [E] global (device*e_cap+rank) slot per input edge
    ok: jnp.ndarray             # no-overflow flag
    agg: Callable               # local edge->node aggregator
    gather: Callable            # halo endpoint gather: x_local -> (x[s], x[r])
    all_gather: Callable        # x_local [n_local, ...] -> [N, ...] global
    local_plan: Any = None      # SortedPlan over the local edges (Pallas mode)
    r_local: Any = None         # local_graph.receivers - index*n_local


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def partition_edges(graph: Graph, num_nodes: int, spec: SpmdSpec):
    """Receiver-partition a padded edge list into [n_parts, e_cap] buffers.

    Runs replicated inside shard_map (O(E log E) argsort, trivial next to
    the cell loops).  Sorting by receiver alone yields owner-grouped AND
    receiver-sorted per-device edge lists, so the local aggregation can use
    ``indices_are_sorted`` / sorted-native Pallas plans directly.

    Returns (stacked Graph [n_parts, e_cap] with GLOBAL indices,
    slot [E] int32 mapping each input edge to its global buffer slot,
    ok flag).
    """
    e = graph.capacity
    n_parts = spec.n_parts
    # BLOCK_E-aligned so per-shard Pallas plans need no internal repadding.
    # Capped at the full (padded) edge capacity: per-device edge work scales
    # directly with e_cap, and a device can never own more than every edge
    # -- without the cap, slack made the 1-chip sharded step process a
    # slack-times-larger edge buffer than the unsharded step (the bulk of
    # the round-3 80% partition overhead, benchmarks/scaling_r03.json).
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import BLOCK_E
    e_cap = _round_up(max(int(e * spec.slack) // n_parts, BLOCK_E), BLOCK_E)
    e_cap = min(e_cap, _round_up(e, BLOCK_E))
    block = num_nodes // n_parts

    big = jnp.int32(num_nodes)  # sorts padded edges past every owner
    key = jnp.where(graph.edge_mask, graph.receivers, big)
    order = jnp.argsort(key)
    s_s = graph.senders[order]
    r_s = graph.receivers[order]
    m_s = graph.edge_mask[order]
    owner = jnp.where(m_s, r_s // block, n_parts)

    counts = segment_sum(jnp.ones((e,), jnp.int32), owner, n_parts + 1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(e, dtype=jnp.int32) - starts[owner]
    keep = m_s & (rank < e_cap)
    ok = jnp.logical_not(jnp.any(m_s & (rank >= e_cap)))
    dump = n_parts * e_cap
    dest = jnp.where(keep, owner * e_cap + rank, dump)

    buf = lambda vals, fill: jnp.full((n_parts * e_cap + 1,), fill,
                                      vals.dtype).at[dest].set(
                                          jnp.where(keep, vals, fill))
    s_buf = buf(s_s, jnp.int32(0))[:-1].reshape(n_parts, e_cap)
    r_buf = buf(r_s, jnp.int32(0))[:-1].reshape(n_parts, e_cap)
    m_buf = buf(keep, False)[:-1].reshape(n_parts, e_cap)

    # slot per INPUT edge (for reassembling edge-space outputs in input
    # order): invert the sort permutation.
    slot = jnp.zeros((e,), jnp.int32).at[order].set(
        jnp.minimum(dest, dump - 1).astype(jnp.int32))
    return Graph(s_buf, r_buf, m_buf), slot, ok


def make_shard_tools(directed: Graph, n_local: int, spec: SpmdSpec) -> ShardTools:
    """Build the per-device partition + aggregation/halo closures.

    Call inside shard_map, after ``bidirectionalize``.  ``n_local`` is the
    local node-row count (global N = n_local * n_parts).
    """
    axis = spec.axis
    num_nodes = n_local * spec.n_parts
    parts, slot, ok = partition_edges(directed, num_nodes, spec)
    idx = jax.lax.axis_index(axis)
    local = Graph(
        jax.lax.dynamic_index_in_dim(parts.senders, idx, keepdims=False),
        jax.lax.dynamic_index_in_dim(parts.receivers, idx, keepdims=False),
        jax.lax.dynamic_index_in_dim(parts.edge_mask, idx, keepdims=False),
    )
    r_local = local.receivers - idx * n_local

    if spec.halo_backend == "rdma" and spec.n_parts > 1:
        # Hand-scheduled bidirectional ICI ring (both ports at once,
        # ceil((P-1)/2) steps, double-buffered) -- see ops/pallas/
        # ring_gather.py.  Falls back to the XLA collective for shapes the
        # kernel's VMEM tiles can't take (1-D masks, unaligned blocks).
        from hierarchicalgnn_tpu.ops.pallas.ring_gather import ring_all_gather

        interp_r = jax.default_backend() != "tpu"

        def _aligned(x):
            if x.ndim != 2 or x.dtype not in (jnp.float32, jnp.bfloat16):
                return False
            sub = 16 if x.dtype == jnp.bfloat16 else 8
            return x.shape[0] % sub == 0 and x.shape[1] % 128 == 0

        def all_gather(x_local):
            if _aligned(x_local):
                return ring_all_gather(x_local, axis, spec.n_parts, interp_r)
            return jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
    else:
        def all_gather(x_local):
            return jax.lax.all_gather(x_local, axis, axis=0, tiled=True)

    if spec.use_pallas:
        # Per-shard sorted-native plan: the local edges are already
        # receiver-sorted by construction, so the plan's sort is the
        # identity permutation and edge tensors stay aggregation-ready.
        from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
            build_sorted_plan, build_transposed_plan, gather_edge_endpoints,
            sorted_aggregate)

        plan = build_sorted_plan(local.senders, r_local, local.edge_mask,
                                 n_local)
        interp = jax.default_backend() != "tpu"

        def agg(data):
            return sorted_aggregate(data, plan, interp)

        # Kernel-backed halo gather: same identity-permutation property,
        # but with GLOBAL ids (num_segments = N) so the backward's two
        # scatter-adds ride the MXU kernel into the [N, D] cotangent that
        # the all_gather VJP (psum_scatter) then reduces -- the XLA
        # scatter here measured ~2x the aggregation kernel unsharded.
        gplan = build_sorted_plan(local.senders, local.receivers,
                                  local.edge_mask, num_nodes)
        gplan_t, g_r2s = build_transposed_plan(
            gplan, local.senders, local.receivers, local.edge_mask,
            num_nodes)

        def gather(x_local):
            x_all = all_gather(x_local)
            return gather_edge_endpoints(x_all, gplan, gplan_t, g_r2s,
                                         interp)
    else:
        def agg(data):
            return segment_sum(data, r_local, n_local, mask=local.edge_mask,
                               indices_are_sorted=True)

        def gather(x_local):
            x_all = all_gather(x_local)
            return x_all[local.senders], x_all[local.receivers]

    return ShardTools(spec=spec, index=idx, n_local=n_local,
                      full_graph=directed, local_graph=local, slot=slot,
                      ok=ok, agg=agg, gather=gather, all_gather=all_gather,
                      local_plan=(plan if spec.use_pallas else None),
                      r_local=r_local)


def bipartite_local_slice(shard: ShardTools, bgraph: Graph, weights, k: int):
    """This device's contiguous bipartite edge block, node ids localized.

    kNN bipartite edges are sender-block contiguous (senders =
    repeat(arange(N), k)), so device d owns rows [d*n_local*k, (d+1)*n_local*k).
    Returns (senders_local, supers_global, mask, weights) of the slice.
    """
    e_loc = shard.n_local * k
    off = shard.index * e_loc

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, off, e_loc, 0)

    senders_local = sl(bgraph.senders) - shard.index * shard.n_local
    return senders_local, sl(bgraph.receivers), sl(bgraph.edge_mask), sl(weights)


def partition_edge_values(slot, edge_mask, values, n_parts: int, e_cap: int):
    """Scatter per-edge values into the ``partition_edges`` buffer layout.

    ``values`` must be zero on padded slots (every weight producer masks
    them), so the scatter-add into the shared dump slot is a no-op and each
    kept edge's unique slot receives exactly its value.  Returns
    ``[n_parts, e_cap, ...]``.
    """
    v = jnp.where(edge_mask[(...,) + (None,) * (values.ndim - 1)], values, 0)
    flat = jnp.zeros((n_parts * e_cap,) + values.shape[1:], values.dtype)
    flat = flat.at[slot].add(v)
    return flat.reshape((n_parts, e_cap) + values.shape[1:])


def sharded_cluster_labels(shard: ShardTools, keep_local, num_nodes: int,
                           min_cluster_size: int, node_mask,
                           max_iters: int = 64):
    """Graph-partitioned connected components -> dense cluster labels.

    The replicated sorted-CC was the single largest pooled-space phase
    (~15 ms of the flagship step, round-4 phase probes) and by itself caps
    the 8-chip Amdahl projection at ~0.76 -- so the hop runs on the LOCAL
    receiver-partitioned edges (min into this device's node rows, Pallas
    blocked-CSR VPU min in sorted mode) and one ``all_gather([n_local])``
    per hop rebuilds the replicated label vector.  Labels stay
    replicated-identical on every device (min is deterministic), so the
    while_loop predicate is uniform and pointer jumps are cheap replicated
    gathers.  Semantics match :func:`ops.connected.cluster_labels_sorted`
    on the full graph (reference scope ``Modules/BipartiteClassification/
    Models/HGNN_GMM.py:172-181``).

    ``keep_local``: bool[e_cap] mask over ``shard.local_graph`` edges (the
    GMM cut); ``node_mask``: replicated bool[num_nodes].
    Returns (clusters int32[num_nodes], n_clusters), both replicated.
    """
    from hierarchicalgnn_tpu.ops.connected import compact_labels
    from hierarchicalgnn_tpu.ops.segment import segment_min, segment_sum

    lg = shard.local_graph
    int_max = jnp.iinfo(jnp.int32).max
    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)

    if shard.local_plan is not None:
        from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
            sorted_segment_min_i32)

        interp = jax.default_backend() != "tpu"

        def local_min(l_edge):
            return sorted_segment_min_i32(l_edge, shard.local_plan, interp)
    else:
        def local_min(l_edge):
            return segment_min(l_edge, shard.r_local, shard.n_local,
                               empty_value=int_max)

    def hop(labels):
        l_edge = jnp.minimum(labels[lg.senders], labels[lg.receivers])
        l_edge = jnp.where(keep_local, l_edge, int_max)
        m = shard.all_gather(local_min(l_edge))
        new = jnp.minimum(labels, m)
        for _ in range(3):  # pointer jumps: replicated, geometric compression
            new = jnp.minimum(new, new[new])
        return new

    def body(state):
        labels, _, it = state
        new = hop(hop(labels))
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters // 2)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), 0))
    labels = jnp.where(node_mask, labels,
                       jnp.arange(num_nodes, dtype=jnp.int32))
    sizes = segment_sum(node_mask.astype(jnp.int32), labels, num_nodes)
    keep_nodes = node_mask & (sizes[labels] >= min_cluster_size)
    return compact_labels(labels, keep_nodes)


def make_hier_shard_aggs(shard: ShardTools, bgraph: Graph, bweights,
                         sgraph: Graph, sweights, max_clusters: int, k: int):
    """Shard-aware aggs/gathers for :class:`models.cells.HierarchicalGNNCell`.

    Collective budget per hierarchical iteration: ONE psum([C, D]) completing
    the bipartite node->supernode reduction + ONE all_gather([N, D]) halo for
    the edge update -- everything else is local or replicated (survey §2.4
    hard part: the 4-way node<->supernode traffic).

    In Pallas mode the bipartite/super convolutions ride the same
    fused-weight sorted-native MXU kernels as the unsharded fast path (the
    XLA scatter formulation here measured 5.4x slower -- docs/DESIGN.md);
    the (replicated) super graph is re-expressed in receiver-sorted order,
    so callers must use the RETURNED (sgraph, sweights).

    Returns (aggs, gathers, sgraph, sweights, ok).

    When :func:`pooled_active` holds, the POOLED space is row-blocked too
    (reference scope being partitioned: the supernode/superedge updates of
    ``Modules/gnn_utils.py:138-152``):

      * supernode rows: device d owns ``[d*c_local, (d+1)*c_local)``;
        the bipartite node->supernode reduction completes with a
        ``psum_scatter`` (half the all-reduce bytes) so the supernode MLP
        runs on local rows only.
      * superedges: receiver-partitioned via :func:`partition_edges` over
        the supernode blocks, so the superedge MLP and the
        superedge->supernode aggregation are local.
      * ``gathers["super_bcast"]`` rebuilds the replicated supernode array
        (one small ``all_gather([c_local, D])`` per use) for the
        supernode->node direction and the superedge endpoint gathers.

    In pooled mode ``bgraph``/``bweights`` must be the LOCAL bipartite
    construction (senders = local node ids) -- the query-sharded kNN emits
    exactly this device's sender-contiguous block; otherwise they are the
    replicated global graph and this device's slice is taken here.
    """
    axis = shard.spec.axis
    n_local = shard.n_local
    pooled = pooled_active(shard.spec, max_clusters)
    if pooled:
        b_send_l, b_sup_l, b_m_l, b_w_l = (bgraph.senders, bgraph.receivers,
                                           bgraph.edge_mask, bweights)
        c_local = max_clusters // shard.spec.n_parts
        s_parts, s_slot, s_ok = partition_edges(sgraph, max_clusters,
                                                shard.spec)
        sw_parts = partition_edge_values(s_slot, sgraph.edge_mask, sweights,
                                         shard.spec.n_parts,
                                         s_parts.senders.shape[1])
        pick = lambda a: jax.lax.dynamic_index_in_dim(a, shard.index,
                                                      keepdims=False)
        sg_loc = Graph(pick(s_parts.senders), pick(s_parts.receivers),
                       pick(s_parts.edge_mask))
        sw_loc = pick(sw_parts)
        sr_loc = sg_loc.receivers - shard.index * c_local

        def scatter_c(partial):
            return jax.lax.psum_scatter(partial, axis, scatter_dimension=0,
                                        tiled=True)

        if shard.spec.use_pallas:
            from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
                build_sorted_plan, sorted_aggregate_weighted)

            interp = jax.default_backend() != "tpu"
            # Local superedges are receiver-sorted by partition_edges, so
            # the plan's sort is the identity permutation (same property
            # the flat-edge path relies on).
            s_plan = build_sorted_plan(sg_loc.senders, sr_loc,
                                       sg_loc.edge_mask, c_local)
            sg_loc = Graph(s_plan.senders_sorted,
                           s_plan.receivers_sorted + shard.index * c_local,
                           s_plan.edge_mask_sorted)
            sw_loc = s_plan.sort(sw_loc)
            p_bs = build_sorted_plan(b_send_l, b_sup_l, b_m_l, max_clusters)
            p_bn = build_sorted_plan(b_sup_l, b_send_l, b_m_l, n_local)
            w_bs = p_bs.sort(b_w_l)
            w_bn = p_bn.sort(b_w_l)
            aggs = {
                "edge_to_node": shard.agg,
                "bip_to_super": (
                    lambda d: scatter_c(
                        sorted_aggregate_weighted(d, w_bs, p_bs, interp)),
                    p_bs.senders_sorted),
                "bip_to_node": (
                    lambda d: sorted_aggregate_weighted(d, w_bn, p_bn,
                                                        interp),
                    p_bn.senders_sorted),
                "super_to_super": lambda d: sorted_aggregate_weighted(
                    d, sw_loc, s_plan, interp),
            }
        else:
            bw = jnp.where(b_m_l[:, None], b_w_l, 0.0)
            sw = jnp.where(sg_loc.edge_mask[:, None], sw_loc, 0.0)
            aggs = {
                "edge_to_node": shard.agg,
                "bip_to_super": (
                    lambda d: scatter_c(segment_sum(
                        d * bw, b_sup_l, max_clusters, mask=b_m_l)),
                    b_send_l),
                "bip_to_node": (
                    lambda d: segment_sum(d * bw, b_send_l, n_local,
                                          mask=b_m_l),
                    b_sup_l),
                "super_to_super": lambda d: segment_sum(
                    d * sw, sr_loc, c_local, mask=sg_loc.edge_mask,
                    indices_are_sorted=True),
            }
        gathers = {
            "graph": shard.gather,
            # called with the ALL-GATHERED (global) supernode array
            "super": lambda x_all: (x_all[sg_loc.senders],
                                    x_all[sg_loc.receivers]),
            "super_bcast": shard.all_gather,
        }
        return aggs, gathers, sg_loc, sw_loc, s_ok

    b_send_l, b_sup_l, b_m_l, b_w_l = bipartite_local_slice(
        shard, bgraph, bweights, k)

    if shard.spec.use_pallas:
        from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
            build_sorted_plan, build_transposed_plan, gather_edge_endpoints,
            sorted_aggregate_weighted)

        interp = jax.default_backend() != "tpu"
        # replicated super space: identical treatment to the unsharded path
        s_plan = build_sorted_plan(sgraph.senders, sgraph.receivers,
                                   sgraph.edge_mask, max_clusters)
        s_plan_t, s_r2s = build_transposed_plan(
            s_plan, sgraph.senders, sgraph.receivers, sgraph.edge_mask,
            max_clusters)
        sgraph = Graph(s_plan.senders_sorted, s_plan.receivers_sorted,
                       s_plan.edge_mask_sorted)
        sweights = s_plan.sort(sweights)
        # local bipartite slice, one receiver-sorted plan per direction
        p_bs = build_sorted_plan(b_send_l, b_sup_l, b_m_l, max_clusters)
        p_bn = build_sorted_plan(b_sup_l, b_send_l, b_m_l, n_local)
        w_bs = p_bs.sort(b_w_l)
        w_bn = p_bn.sort(b_w_l)

        aggs = {
            "edge_to_node": shard.agg,
            "bip_to_super": (
                lambda d: jax.lax.psum(
                    sorted_aggregate_weighted(d, w_bs, p_bs, interp), axis),
                p_bs.senders_sorted),
            "bip_to_node": (
                lambda d: sorted_aggregate_weighted(d, w_bn, p_bn, interp),
                p_bn.senders_sorted),
            "super_to_super": lambda d: sorted_aggregate_weighted(
                d, sweights, s_plan, interp),
        }
        gathers = {
            "graph": shard.gather,
            "super": lambda x: gather_edge_endpoints(
                x, s_plan, s_plan_t, s_r2s, interp),
        }
        return aggs, gathers, sgraph, sweights, jnp.asarray(True)

    bw = jnp.where(b_m_l[:, None], b_w_l, 0.0)
    sw = jnp.where(sgraph.edge_mask[:, None], sweights, 0.0)
    aggs = {
        "edge_to_node": shard.agg,
        "bip_to_super": (
            lambda d: jax.lax.psum(
                segment_sum(d * bw, b_sup_l, max_clusters, mask=b_m_l), axis),
            b_send_l),
        "bip_to_node": (
            lambda d: segment_sum(d * bw, b_send_l, n_local, mask=b_m_l),
            b_sup_l),
        "super_to_super": lambda d: segment_sum(
            d * sw, sgraph.receivers, max_clusters, mask=sgraph.edge_mask),
    }
    gathers = {
        "graph": shard.gather,
        "super": lambda x: (x[sgraph.senders], x[sgraph.receivers]),
    }
    return aggs, gathers, sgraph, sweights, jnp.asarray(True)


# ---------------------------------------------------------------------------
# Trainer-usable sharded steps.
# ---------------------------------------------------------------------------

_NODE_SHARDED_FIELDS = ("x", "node_mask")


def _model_out_specs(model_name: str, graph_axis, data_axis=None,
                     batched=False, pooled=False):
    """shard_map out_specs prefix tree for each model's forward outputs.

    Node/edge-space outputs come back sharded over the graph axis (shard_map
    reassembles the global array); supernode-space and aux outputs are
    replicated across it.  ``batched``: outputs carry a leading event-batch
    dim (sharded over ``data_axis`` when given).  ``pooled``: the
    pooled-space partition is active (must equal
    ``pooled_active(spec, max_clusters)``) -- BC/gMRT then return their
    bipartite graph as this device's sender-contiguous block, which
    shard_map reassembles into exactly the unsharded global edge order.
    """
    g = graph_axis
    lead = (data_axis,) if batched else ()
    rep = P(*lead) if lead else P()
    shd = P(*lead, g)
    if model_name == "EC-IN":
        return shd                          # scores [E]
    if model_name == "Embedding-IN":
        return shd                          # embeddings [N, emb]
    if model_name == "Embedding-HGNN-GMM":
        return (shd, shd, rep)              # emb, intermediate, aux
    # BC-HGNN-GMM / gMRT: (bgraph, scores, intermediate, aux)
    bg = Graph(shd, shd, shd) if pooled else rep
    return (bg, shd, shd, rep)


def make_sharded_train_step(pipeline, optimizer, mesh: Mesh, hparams: dict,
                            data_axis: str = "data",
                            graph_axis: str = "graph"):
    """Jitted (state, batched_event [B,...], epoch) -> (state, metrics) with
    the model forward graph-partitioned over ``graph_axis`` and events over
    ``data_axis`` (B = mesh data size).

    The forward runs inside shard_map (explicit halo/psum schedule above);
    the loss -- including the bipartite matching truth -- runs replicated on
    the reassembled global outputs, exactly the unsharded
    ``pipeline.loss_from_outputs``.
    """
    from hierarchicalgnn_tpu.train.pipelines import MUTABLE
    from hierarchicalgnn_tpu.train.trainer import TrainState

    model = pipeline.model
    name = hparams["model"]
    n_parts = mesh.shape[graph_axis]
    spec = SpmdSpec(axis=graph_axis, n_parts=n_parts,
                    slack=float(hparams.get("halo_slack", 1.5)),
                    use_pallas=bool(hparams.get("use_pallas", False)),
                    halo_backend=str(hparams.get("halo_backend", "xla")),
                    shard_pooled=bool(hparams.get("shard_pooled", True)))
    pooled = pooled_active(spec, int(hparams.get("max_clusters", 1024)))
    d_ax = data_axis if data_axis in mesh.shape else None

    def per_event(params, buffers, x, node_mask, graph):
        variables = {"params": params, **buffers}
        out, new_vars = model.apply(
            variables, x, graph, node_mask=node_mask, training=True,
            mutable=MUTABLE, spmd=spec)
        return out, dict(new_vars)

    rep = P()
    data_size = mesh.shape.get(data_axis, 1) if d_ax else 1
    if data_size == 1:
        # B=1 specialization: run per_event directly on the squeezed event.
        # vmap-over-one-event is NOT free here -- the flagship anchor
        # measured the batched wrapper at +87 ms/step (21%) while
        # grad(loss) itself matched the unsharded program within 1.5%
        # (benchmarks/scaling_r04.json phase ladder).
        fwd = shard_map(
            per_event, mesh=mesh,
            in_specs=(rep, rep, P(graph_axis), P(graph_axis), rep),
            out_specs=(_model_out_specs(name, graph_axis,
                                        pooled=pooled), rep),
            check_vma=False,
        )

        # The warm-flagship matching truth is the single largest phase
        # that would otherwise run replicated in the loss (223 ms of the
        # 525 ms step, benchmarks/phases_r05.log): row-shard the auction's
        # bidding sweep over the graph axis (bit-identical trajectory --
        # its cross-shard reductions are max/min/int; train/auction.py).
        matching_spmd = ((mesh, graph_axis)
                         if bool(hparams.get("shard_matching", True))
                         else None)

        def batched_loss(params, buffers, batch, epoch):
            ev = jax.tree.map(lambda a: a[0], batch)
            out, new_buffers = fwd(params, buffers, ev.x, ev.node_mask,
                                   ev.graph)
            loss, metrics = pipeline.loss_from_outputs(
                out, ev, epoch, matching_spmd=matching_spmd)
            return loss, (new_buffers, metrics)
    else:
        def body(params, buffers, x, node_mask, graph):
            return jax.vmap(per_event, in_axes=(None, None, 0, 0, 0))(
                params, buffers, x, node_mask, graph)

        node_spec = P(d_ax, graph_axis)
        ev_rep = P(d_ax)
        fwd = shard_map(
            body, mesh=mesh,
            in_specs=(rep, rep, node_spec, node_spec, ev_rep),
            out_specs=(_model_out_specs(name, graph_axis, d_ax,
                                        batched=True, pooled=pooled), ev_rep),
            check_vma=False,
        )

        def batched_loss(params, buffers, batch, epoch):
            out, new_buffers = fwd(params, buffers, batch.x,
                                   batch.node_mask, batch.graph)

            def one(o, ev):
                return pipeline.loss_from_outputs(o, ev, epoch)

            losses, mets = jax.vmap(one)(out, batch)
            new_buffers = jax.tree.map(lambda b: jnp.mean(b, axis=0),
                                       new_buffers)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), mets)
            return jnp.mean(losses), (new_buffers, metrics)

    def train_step(state: TrainState, batch, epoch):
        (loss, (new_buffers, metrics)), grads = jax.value_and_grad(
            batched_loss, has_aux=True)(state.params, state.buffers,
                                        batch, epoch)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, buffers=new_buffers,
                               opt_state=new_opt_state, step=state.step + 1)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_sharded_forward(pipeline, mesh: Mesh, hparams: dict,
                         graph_axis: str = "graph"):
    """Inference/validation forward under the graph partition (single event)."""
    model = pipeline.model
    name = hparams["model"]
    spec = SpmdSpec(axis=graph_axis, n_parts=mesh.shape[graph_axis],
                    slack=float(hparams.get("halo_slack", 1.5)),
                    use_pallas=bool(hparams.get("use_pallas", False)),
                    halo_backend=str(hparams.get("halo_backend", "xla")),
                    shard_pooled=bool(hparams.get("shard_pooled", True)))
    pooled = pooled_active(spec, int(hparams.get("max_clusters", 1024)))

    def body(params, buffers, x, node_mask, graph):
        variables = {"params": params, **buffers}
        return model.apply(variables, x, graph, node_mask=node_mask,
                           training=False, spmd=spec)

    rep = P()
    fwd = shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, P(graph_axis), P(graph_axis), rep),
        out_specs=_model_out_specs(name, graph_axis, pooled=pooled),
        check_vma=False,
    )
    return jax.jit(fwd)
