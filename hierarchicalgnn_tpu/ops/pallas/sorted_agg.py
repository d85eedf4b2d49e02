"""Sorted-native Pallas segment aggregation: zero-gather message reduction.

The blocked-CSR kernel in ``segment_kernel.py`` is fast (MXU-bound) but
pays an 18 ms XLA gather to materialize its padded layout at TrackML scale
-- 3x the kernel itself.  This module removes the gather: edge tensors
*live* in receiver-sorted order for the whole forward pass (the sort is a
per-forward int permutation of the graph; edge features are then created
sorted by construction), and the kernel walks variable-length row-group
extents with scalar-prefetched chunk offsets:

  * edges sorted by receiver: group g's edges occupy [start[g], end[g]) --
    contiguous, no padding slots, no data movement.
  * grid (group, chunk): chunk c covers block ``chunk_base[g] + c`` of the
    sorted edge array (block-aligned, so boundary chunks contain a few
    foreign edges -- masked out by the row-range check in the one-hot).
  * per-group chunk counts are prefetched; surplus grid steps clamp their
    index map to the last needed block (no re-DMA) and skip the matmul.

Backward is a near-sequential gather ``cotangent[receivers_sorted]`` via
custom VJP.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults from the round-3 hardware sweep (scripts/sweep_agg_blocks.py,
# E=512k D=256 on v5e): (block_r=256, block_e=1024) is fastest for BOTH
# dtypes -- bf16 0.793 ms (661M edges/s, +13% over 512-edge blocks; the
# bf16 path is per-step-overhead-bound, so larger edge blocks amortize the
# one-hot build + DMA setup), f32 1.096 ms (478M).  block_r trades MXU
# one-hot FLOPs (linear in block_r) against boundary-chunk slop; 256 beats
# both 128 and 512 at TrackML edge densities.
# Env overrides (debug/bisect aid): HGNN_BLOCK_E / HGNN_BLOCK_R.
BLOCK_E = int(os.environ.get("HGNN_BLOCK_E", "1024"))
BLOCK_R = int(os.environ.get("HGNN_BLOCK_R", "256"))
# Backward-pass formulation (perf A/B aid): "xla" restores the fused
# sorted-index gather + elementwise backward; default rides the
# scaled-gather / SDDMM kernels (ops/pallas/sddmm_kernel.py).
KERNEL_BWD = os.environ.get("HGNN_KERNEL_BWD", "1") not in ("0", "xla")


@struct.dataclass
class SortedPlan:
    """Receiver-sort plan for a fixed edge structure."""

    perm: jnp.ndarray              # int32[E_pad]: original idx per sorted slot
    inv_perm: jnp.ndarray          # int32[E_pad]: sorted slot per original idx
    senders_sorted: jnp.ndarray    # int32[E_pad]
    receivers_sorted: jnp.ndarray  # int32[E_pad]
    edge_mask_sorted: jnp.ndarray  # bool[E_pad]
    seg_rep: jnp.ndarray           # int32[E_pad//BE, 8, BE] sentinel=n_rows
    chunk_base: jnp.ndarray        # int32[G]
    n_chunks: jnp.ndarray          # int32[G] (>=1)
    overflowed: jnp.ndarray        # bool[]
    num_segments: int = struct.field(pytree_node=False)
    block_r: int = struct.field(pytree_node=False)
    block_e: int = struct.field(pytree_node=False)
    c_max: int = struct.field(pytree_node=False)

    def sort(self, x):
        """Bring an original-order edge array into (padded) sorted order.

        Slots that are padding or invalid are zero-filled.
        """
        idx = jnp.minimum(self.perm, x.shape[0] - 1)
        out = x[idx]
        m = self.edge_mask_sorted
        m = m.reshape(m.shape + (1,) * (out.ndim - 1))
        return jnp.where(m, out, jnp.zeros((), out.dtype))

    def unsort(self, x):
        """Recover original edge order (original capacity)."""
        return x[self.inv_perm]


@functools.partial(jax.jit, static_argnames=("num_segments", "block_r",
                                             "block_e", "c_max"))
def build_sorted_plan(senders, receivers, edge_mask, num_segments,
                      block_r=BLOCK_R, block_e=BLOCK_E,
                      c_max: int | None = None) -> SortedPlan:
    """Sort edges by receiver (invalid last) and precompute chunk extents.

    ``c_max`` bounds chunks per row-group; a group needing more sets
    ``overflowed`` (dispatcher falls back to XLA).  Edge capacity is padded
    internally to a ``block_e`` multiple; the plan's sorted arrays (and any
    data created in plan order) use the padded length, while ``unsort``
    recovers the original capacity.
    """
    receivers = receivers.astype(jnp.int32)
    e_orig = receivers.shape[0]
    pad = (-e_orig) % block_e
    if pad:
        receivers = jnp.pad(receivers, (0, pad))
        senders = jnp.pad(senders, (0, pad))
        edge_mask = jnp.pad(edge_mask, (0, pad))
    e_pad = receivers.shape[0]
    n_groups = -(-num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e
    if c_max is None:
        uniform = max(1, -(-e_pad // (n_groups * block_e)))
        c_max = min(2 * uniform + 1, n_blocks)

    key = jnp.where(edge_mask, receivers, n_rows)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    # inv_perm maps ORIGINAL edge indices -> sorted slots (padding slots
    # beyond the original capacity are dropped)
    inv_perm = (jnp.zeros((e_orig,), jnp.int32)
                .at[perm].set(jnp.arange(e_pad, dtype=jnp.int32),
                              mode="drop"))
    mask_sorted = edge_mask[perm]
    receivers_sorted = jnp.where(mask_sorted, receivers[perm], 0)
    senders_sorted = jnp.where(mask_sorted, senders.astype(jnp.int32)[perm], 0)
    seg = jnp.where(mask_sorted, receivers_sorted, n_rows)

    group = jnp.minimum(seg // block_r, n_groups)
    counts = jax.ops.segment_sum(
        jnp.ones_like(group), group, num_segments=n_groups + 1)[:n_groups]
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                              jnp.cumsum(counts)[:-1]]).astype(jnp.int32)
    ends = (starts + counts).astype(jnp.int32)
    chunk_base = starts // block_e
    last_block = jnp.maximum((ends - 1) // block_e, chunk_base)
    n_chunks = jnp.where(counts > 0, last_block - chunk_base + 1, 1)
    chunk_base = jnp.minimum(chunk_base, n_blocks - 1)

    seg_rep = jnp.broadcast_to(
        seg.reshape(n_blocks, 1, block_e), (n_blocks, 8, block_e))

    overflowed = jnp.any(n_chunks > c_max)
    return SortedPlan(
        perm=perm, inv_perm=inv_perm, senders_sorted=senders_sorted,
        receivers_sorted=receivers_sorted, edge_mask_sorted=mask_sorted,
        seg_rep=seg_rep, chunk_base=chunk_base,
        n_chunks=n_chunks.astype(jnp.int32), overflowed=overflowed,
        num_segments=num_segments, block_r=block_r, block_e=block_e,
        c_max=c_max)


def _sorted_kernel(cb_ref, nch_ref, seg_ref, data_ref, out_ref, *, block_r):
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        # seg block (1, 8, BLOCK_E): global row ids on lanes.  Subtract the
        # group's row offset; foreign/invalid edges fall outside [0, R) and
        # produce all-zero one-hot columns.
        seg = seg_ref[0, 0:1, :] - g * block_r  # (1, BLOCK_E)
        block_e = seg.shape[1]
        onehot_t = (jnp.broadcast_to(seg, (block_r, block_e))
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (block_r, block_e), 0)
                    ).astype(data_ref.dtype)
        out_ref[:] += jax.lax.dot_general(
            onehot_t, data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _pallas_sorted_aggregate(data_sorted, seg_rep, chunk_base, n_chunks,
                             num_segments, block_r, block_e, c_max,
                             interpret=False):
    e_pad, d = data_sorted.shape
    n_groups = -(-num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e

    def block_idx(g, c, cb, nch):
        # clamp surplus steps to the last needed block: index unchanged
        # across skipped iterations -> no re-DMA
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((block_e, d),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda g, c, cb, nch: (g, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sorted_kernel, block_r=block_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
    )(chunk_base, n_chunks, seg_rep, data_sorted)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _sorted_agg(data_sorted, seg_rep, chunk_base, n_chunks, receivers_sorted,
                mask_sorted, num_segments, block_r, block_e, c_max, interpret):
    return _pallas_sorted_aggregate(
        data_sorted, seg_rep, chunk_base, n_chunks, num_segments, block_r,
        block_e, c_max, interpret)


def _sorted_agg_fwd(data_sorted, seg_rep, chunk_base, n_chunks,
                    receivers_sorted, mask_sorted, num_segments, block_r,
                    block_e, c_max, interpret):
    out = _sorted_agg(data_sorted, seg_rep, chunk_base, n_chunks,
                      receivers_sorted, mask_sorted, num_segments, block_r,
                      block_e, c_max, interpret)
    # zero-size prototype records the (possibly sub-f32) input dtype so the
    # cotangent matches the primal when data rides the kernel in bf16
    proto = jnp.zeros((0,), data_sorted.dtype)
    return out, (seg_rep, chunk_base, n_chunks, receivers_sorted,
                 mask_sorted, proto)


def _sorted_agg_bwd(num_segments, block_r, block_e, c_max, interpret,
                    residuals, g):
    # cotangent[e] = g[recv(e)]: a SORTED-index row gather.  KERNEL_BWD
    # routes it through the one-hot MXU kernel; the XLA form (fused
    # sorted gather) is kept as an A/B path -- see HGNN_KERNEL_BWD.
    seg_rep, chunk_base, n_chunks, receivers_sorted, mask_sorted, proto = \
        residuals
    if not KERNEL_BWD:
        idx = jnp.minimum(receivers_sorted, num_segments - 1)
        grad = jnp.where(mask_sorted[:, None], g[idx], 0.0).astype(
            proto.dtype)
        return grad, None, None, None, None, None
    from hierarchicalgnn_tpu.ops.pallas.sddmm_kernel import scaled_gather_raw

    grad = scaled_gather_raw(
        None, g, seg_rep, chunk_base, n_chunks, receivers_sorted,
        mask_sorted, jnp.asarray(False), num_segments, block_r, block_e,
        c_max, interpret).astype(proto.dtype)
    return grad, None, None, None, None, None


_sorted_agg.defvjp(_sorted_agg_fwd, _sorted_agg_bwd)


def _sorted_weighted_kernel(cb_ref, nch_ref, seg_ref, w_ref, data_ref,
                            out_ref, *, block_r):
    """One-hot matmul with the per-edge weight folded into the one-hot.

    ``w_ref`` carries per-edge scalar weights in the same (1, 8, BLOCK_E)
    broadcast layout as ``seg_ref``; instead of 0/1 entries the one-hot
    matrix holds ``w_e``, so ``out[r] = sum_e w_e * data_e`` comes out of a
    single MXU pass -- no materialized ``data * w`` edge tensor.
    """
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r   # (1, BLOCK_E)
        w = w_ref[0, 0:1, :]                     # (1, BLOCK_E)
        block_e = seg.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg, (block_r, block_e)) == rows
        wmat = jnp.where(onehot, jnp.broadcast_to(w, (block_r, block_e)),
                         0.0).astype(data_ref.dtype)
        out_ref[:] += jax.lax.dot_general(
            wmat, data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _pallas_sorted_weighted(data_sorted, w_rep, seg_rep, chunk_base, n_chunks,
                            num_segments, block_r, block_e, c_max,
                            interpret=False):
    e_pad, d = data_sorted.shape
    n_groups = -(-num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e

    def block_idx(g, c, cb, nch):
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((block_e, d),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda g, c, cb, nch: (g, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sorted_weighted_kernel, block_r=block_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
    )(chunk_base, n_chunks, seg_rep, w_rep, data_sorted)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sorted_aggregate_weighted(data_sorted, weights_sorted, plan: SortedPlan,
                              interpret=False):
    """Masked weighted segment sum ``out[i] = sum_{e: recv(e)=i} w_e d_e``.

    The per-edge scalar weight rides inside the one-hot MXU matmul, so the
    weighting costs no extra HBM pass (the unfused form materializes
    ``data * w`` first).  Differentiable in both ``data_sorted`` ([E_pad, D],
    plan order) and ``weights_sorted`` ([E_pad] or [E_pad, 1], plan order).
    This is the hot form of the hierarchical cell's bipartite/supergraph
    convolutions (reference ``Modules/gnn_utils.py:124,142-143``).
    """
    out, _ = _sorted_weighted_fwd(data_sorted, weights_sorted, plan, interpret)
    return out


def _weighted_forward(data_sorted, weights_sorted, plan, interpret):
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    w = weights_sorted.reshape(weights_sorted.shape[0])
    w = jnp.where(plan.edge_mask_sorted, w, 0.0).astype(jnp.float32)
    e_pad = data_sorted.shape[0]
    n_blocks = e_pad // plan.block_e
    w_rep = jnp.broadcast_to(
        w.reshape(n_blocks, 1, plan.block_e), (n_blocks, 8, plan.block_e))
    return jax.lax.cond(
        plan.overflowed,
        lambda d: segment_sum(
            jnp.where(plan.edge_mask_sorted, w, 0.0)[:, None]
            * d.astype(jnp.float32),
            plan.receivers_sorted, plan.num_segments,
            indices_are_sorted=True).astype(jnp.float32),
        lambda d: _pallas_sorted_weighted(
            d, w_rep, plan.seg_rep, plan.chunk_base, plan.n_chunks,
            plan.num_segments, plan.block_r, plan.block_e, plan.c_max,
            interpret),
        data_sorted)


def _sorted_weighted_fwd(data_sorted, weights_sorted, plan, interpret):
    out = _weighted_forward(data_sorted, weights_sorted, plan, interpret)
    return out, (data_sorted, weights_sorted, plan)


def _sorted_weighted_bwd(interpret, residuals, g):
    # d_data[e] = w_e * g[recv(e)]   -> scaled-gather one-hot MXU kernel
    # d_w[e]    = <g[recv(e)], d_e>  -> sorted SDDMM kernel
    # XLA A/B path (HGNN_KERNEL_BWD=0): one fused sorted-index gather +
    # elementwise -- the r3 formulation.
    data_sorted, weights_sorted, plan = residuals
    if not KERNEL_BWD:
        idx = jnp.minimum(plan.receivers_sorted, plan.num_segments - 1)
        ge = jnp.where(plan.edge_mask_sorted[:, None], g[idx], 0.0)
        w = weights_sorted.reshape(weights_sorted.shape[0])
        d_data = (ge * w[:, None].astype(jnp.float32)).astype(
            data_sorted.dtype)
        d_w = jnp.sum(ge * data_sorted.astype(jnp.float32), axis=-1)
        d_w = jnp.where(plan.edge_mask_sorted, d_w, 0.0)
        d_w = d_w.reshape(weights_sorted.shape).astype(weights_sorted.dtype)
        return d_data, d_w, None
    from hierarchicalgnn_tpu.ops.pallas.sddmm_kernel import (
        scaled_gather, sorted_sddmm)

    w = weights_sorted.reshape(weights_sorted.shape[0]).astype(jnp.float32)
    d_data = scaled_gather(w, g, plan, interpret).astype(data_sorted.dtype)
    d_w = sorted_sddmm(data_sorted, g, plan, interpret)
    d_w = d_w.reshape(weights_sorted.shape).astype(weights_sorted.dtype)
    return d_data, d_w, None


sorted_aggregate_weighted.defvjp(_sorted_weighted_fwd, _sorted_weighted_bwd)


def _sorted_min_kernel(cb_ref, nch_ref, seg_ref, vals_ref, out_ref, *,
                       block_r, int_max):
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, int_max)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r      # (1, BLOCK_E)
        vals = vals_ref[0, 0:1, :]                  # (1, BLOCK_E)
        block_e = seg.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg, (block_r, block_e)) == rows
        masked = jnp.where(onehot, jnp.broadcast_to(vals, (block_r, block_e)),
                           int_max)
        chunk_min = jnp.min(masked, axis=1, keepdims=True)  # (block_r, 1)
        out_ref[:] = jnp.minimum(out_ref[:], chunk_min)


def sorted_segment_min_i32(values_sorted, plan: SortedPlan, interpret=False):
    """Masked int32 segment-min of sorted-order per-edge values.

    The VPU companion of :func:`sorted_aggregate` for min-reductions that
    cannot ride the MXU one-hot matmul (connected-components label
    propagation).  Scatter-min on TPU serializes per element (~ms per call
    at TrackML sizes); this runs the same reduction as a lane-masked min
    over the blocked-CSR chunks.  Pass ``INT32_MAX`` in masked-out slots.
    Empty segments return INT32_MAX (caller combines with identity labels).
    """
    int_max = jnp.iinfo(jnp.int32).max
    e_pad = values_sorted.shape[0]
    block_r, block_e, c_max = plan.block_r, plan.block_e, plan.c_max
    n_groups = -(-plan.num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e

    vals_rep = jnp.broadcast_to(
        values_sorted.reshape(n_blocks, 1, block_e), (n_blocks, 8, block_e))

    def block_idx(g, c, cb, nch):
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, 1), lambda g, c, cb, nch: (g, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sorted_min_kernel, block_r=block_r,
                          int_max=int_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        interpret=interpret,
    )(plan.chunk_base, plan.n_chunks, plan.seg_rep, vals_rep)
    return out[:plan.num_segments, 0]


def sorted_aggregate(data_sorted, plan: SortedPlan, interpret=False):
    """Masked segment sum of sorted-order edge ``data`` -> [num_segments, D].

    ``data_sorted`` rows must already be in ``plan`` order (created sorted,
    or brought over once with ``plan.sort``).  Falls back to XLA scatter on
    chunk-budget overflow.
    """
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    return jax.lax.cond(
        plan.overflowed,
        lambda d: segment_sum(
            jnp.where(plan.edge_mask_sorted[:, None], d, 0.0),
            plan.receivers_sorted, plan.num_segments,
            indices_are_sorted=True).astype(jnp.float32),
        lambda d: _sorted_agg(
            d, plan.seg_rep, plan.chunk_base, plan.n_chunks,
            plan.receivers_sorted, plan.edge_mask_sorted, plan.num_segments,
            plan.block_r, plan.block_e, plan.c_max, interpret),
        data_sorted)


# ---------------------------------------------------------------------------
# Endpoint gathers with kernel-backed backward.
#
# The backward of nodes[senders]/nodes[receivers] is a scatter-add into the
# node array -- on TPU an XLA scatter costing ~2x the whole aggregation
# kernel at TrackML sizes, paid twice per cell per iteration.  The receiver
# side's cotangent arrives already receiver-sorted, so it aggregates through
# the MXU kernel directly; the sender side stays on XLA scatter (its order
# doesn't match the plan).
# ---------------------------------------------------------------------------


def _plan_aggregate(g, plan: SortedPlan, interpret):
    """Masked kernel aggregation with overflow fallback (no autodiff)."""
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    g = jnp.where(plan.edge_mask_sorted[:, None], g, 0.0)
    return jax.lax.cond(
        plan.overflowed,
        lambda x: segment_sum(x, plan.receivers_sorted, plan.num_segments,
                              indices_are_sorted=True).astype(jnp.float32),
        lambda x: _pallas_sorted_aggregate(
            x, plan.seg_rep, plan.chunk_base, plan.n_chunks,
            plan.num_segments, plan.block_r, plan.block_e, plan.c_max,
            interpret),
        g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_ee(nodes, plan, plan_t, r2s, interpret):
    return nodes[plan.senders_sorted], nodes[plan.receivers_sorted]


def _gather_ee_fwd(nodes, plan, plan_t, r2s, interpret):
    return _gather_ee(nodes, plan, plan_t, r2s, interpret), (plan, plan_t,
                                                             r2s)


def _gather_ee_bwd(interpret, residuals, cots):
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    plan, plan_t, r2s = residuals
    g_s, g_r = cots
    d_r = _plan_aggregate(g_r, plan, interpret)
    if plan_t is not None:
        # reorder the sender cotangent into the sender-sorted (transposed)
        # plan's slot order, then aggregate on the kernel as well
        g_s_t = jnp.where(plan_t.edge_mask_sorted[:, None], g_s[r2s], 0.0)
        d_s = _plan_aggregate(g_s_t, plan_t, interpret)
    else:
        d_s = segment_sum(
            jnp.where(plan.edge_mask_sorted[:, None], g_s, 0.0),
            plan.senders_sorted, plan.num_segments).astype(jnp.float32)
    return ((d_r + d_s).astype(g_r.dtype), None, None, None)


_gather_ee.defvjp(_gather_ee_fwd, _gather_ee_bwd)


def build_transposed_plan(plan: SortedPlan, senders, receivers, edge_mask,
                          num_segments):
    """Sender-sorted companion plan + cross-permutation for
    :func:`gather_edge_endpoints`'s sender-side backward.

    ``r2s[k]`` is the receiver-plan slot holding the same original edge as
    transposed-plan slot ``k``.
    """
    plan_t = build_sorted_plan(receivers, senders, edge_mask, num_segments,
                               block_r=plan.block_r, block_e=plan.block_e)
    e_orig = senders.shape[0]
    r2s = jnp.where(
        plan_t.edge_mask_sorted,
        plan.inv_perm[jnp.minimum(plan_t.perm, e_orig - 1)], 0)
    return plan_t, r2s.astype(jnp.int32)


def gather_edge_endpoints(nodes, plan: SortedPlan, plan_t=None, r2s=None,
                          interpret=False):
    """(nodes[senders], nodes[receivers]) in plan order.

    The backward scatter-adds ride the MXU kernel: the receiver-side
    cotangent directly (already plan-sorted), and -- when the transposed
    plan is supplied -- the sender side through a cross-permutation into
    sender-sorted order.
    """
    return _gather_ee(nodes, plan, plan_t, r2s, interpret)
