"""Sorted-native Pallas SDDMM: per-edge <edge_vec, row[receiver]> products.

The reference computes per-edge endpoint dot products with a torch einsum
over two random row gathers (``Modules/gnn_utils.py:208``,
``Modules/BipartiteClassification/Models/HGNN_GMM.py:188``).  On TPU a
random [E] row gather from [N, 256] runs far below HBM speed-of-light
(XLA lowers it to serial dynamic slices; measured ~14% of SoL at d=256,
round-3 ``bench_report.json``).  This module removes the gather on the
receiver side the same way ``sorted_agg.py`` removes the scatter: edges
live receiver-sorted (``SortedPlan``), so a row-group's edges are
contiguous and the per-edge row lookup becomes a one-hot select off an
MXU matmul over the group's rows -- rows stream from HBM exactly once
per group (full reuse), never per edge.

Formulation per (group g, chunk c), mirroring the sorted-agg grid:

    S       = Y_g @ X_chunk^T                 # [BR, BE] all (row, edge) dots, MXU
    out[e] += sum_r onehot[r, e] * S[r, e]    # masked sublane reduction, VPU

``X_chunk`` is per-edge data ([E, D], plan order) -- in the cells, edge
tensors already live in plan order, so no gather exists on this side
either.  Framework call sites:

  * the d_w backward of ``sorted_aggregate_weighted`` (d_w[e] =
    <g[recv(e)], data_e>) -- every weighted-convolution VJP,
  * edge likelihood / logits style ops where one side is edge data.

The boundary-block subtlety: edge blocks on a group boundary are visited
by BOTH groups (each contributes only its own edges via the one-hot
mask), so the output block zero-initializes only on its FIRST visit --
detected from the prefetched chunk extents -- and accumulates after.
Blocks holding only padding edges are never visited; their (undefined)
contents are masked to zero outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
    SortedPlan, sorted_aggregate_weighted)


def _first_visit(cb_ref, nch_ref, g, c):
    """True when this grid step is the FIRST to touch its output block.

    Chunks c>0 always open a fresh block; only a group's FIRST chunk can
    land on a block the previous group already wrote (the shared boundary
    block).  Surplus steps (c >= n_chunks) revisit the last needed block
    and must not re-initialize it.
    """
    this_block = cb_ref[g] + jnp.minimum(c, nch_ref[g] - 1)
    prev_last = jnp.where(g > 0, cb_ref[jnp.maximum(g - 1, 0)]
                          + nch_ref[jnp.maximum(g - 1, 0)] - 1, -1)
    return (c < nch_ref[g]) & ((c > 0) | (this_block != prev_last))


def _sddmm_kernel(cb_ref, nch_ref, seg_ref, rows_ref, data_ref, out_ref, *,
                  block_r, n_blocks):
    """Output [n_blocks, block_e] stays VMEM-resident for the whole grid
    (constant index map; it is E_pad*4 bytes, well under VMEM): each step
    accumulates its chunk's contributions into a dynamically-indexed row,
    so boundary blocks shared by adjacent groups need no special-casing
    and all-padding tail blocks stay at the zero init.  (A (1, block_e)
    block-mapped output is rejected by the TPU lowering: the sublane dim
    of a block must be divisible by 8 or span the array.)"""
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when((g == 0) & (c == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r          # (1, BE)
        block_e = seg.shape[1]
        onehot = (jnp.broadcast_to(seg, (block_r, block_e))
                  == jax.lax.broadcasted_iota(
                      jnp.int32, (block_r, block_e), 0))
        # all (row, edge) dots of this group's rows vs the chunk's edges
        s = jax.lax.dot_general(
            rows_ref[:], data_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (BR, BE)
        contrib = jnp.sum(jnp.where(onehot, s, 0.0), axis=0, keepdims=True)
        b = jnp.minimum(cb_ref[g] + jnp.minimum(c, nch_ref[g] - 1),
                        n_blocks - 1)
        out_ref[pl.ds(b, 1), :] += contrib


def _pallas_sddmm(data_sorted, rows, seg_rep, chunk_base, n_chunks,
                  num_segments, block_r, block_e, c_max, interpret=False):
    e_pad, d = data_sorted.shape
    n_groups = -(-num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e
    rows_padded = rows
    if rows.shape[0] != n_rows:
        rows_padded = jnp.pad(rows, ((0, n_rows - rows.shape[0]), (0, 0)))

    def block_idx(g, c, cb, nch):
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((block_r, d), lambda g, c, cb, nch: (g, 0)),
            pl.BlockSpec((block_e, d),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0)),
        ],
        out_specs=pl.BlockSpec((n_blocks, block_e),
                               lambda g, c, cb, nch: (0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, block_r=block_r, n_blocks=n_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block_e), jnp.float32),
        interpret=interpret,
    )(chunk_base, n_chunks, seg_rep, rows_padded, data_sorted)
    return out.reshape(e_pad)


def _scaled_gather_kernel(cb_ref, nch_ref, seg_ref, scale_ref, rows_ref,
                          out_ref, *, block_r):
    """out[e, :] += scale[e] * rows[recv(e), :] -- the d_data side of the
    SDDMM VJP (and, with scale=1, the kernel-backed backward of
    ``sorted_aggregate``): a one-hot MXU gather with the per-edge scale
    folded into the one-hot, exactly dual to ``_sorted_weighted_kernel``."""
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(_first_visit(cb_ref, nch_ref, g, c))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r          # (1, BE)
        w = scale_ref[0, 0:1, :]                        # (1, BE)
        block_e = seg.shape[1]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg, (block_r, block_e)) == rows_iota
        wmat = jnp.where(onehot, jnp.broadcast_to(w, (block_r, block_e)),
                         0.0).astype(rows_ref.dtype)
        out_ref[:] += jax.lax.dot_general(
            wmat, rows_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _pallas_scaled_gather(scale_rep, rows, seg_rep, chunk_base, n_chunks,
                          num_segments, block_r, block_e, c_max,
                          interpret=False):
    n_blocks, _, _ = seg_rep.shape
    e_pad = n_blocks * block_e
    d = rows.shape[1]
    n_groups = -(-num_segments // block_r)
    n_rows = n_groups * block_r
    rows_padded = rows
    if rows.shape[0] != n_rows:
        rows_padded = jnp.pad(rows, ((0, n_rows - rows.shape[0]), (0, 0)))

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
            pl.BlockSpec((block_r, d), lambda g, c, cb, nch: (g, 0)),
        ],
        out_specs=pl.BlockSpec((block_e, d),
                               lambda g, c, cb, nch: (block_idx(g, c, cb, nch),
                                                      0)),
    )
    out = pl.pallas_call(
        functools.partial(_scaled_gather_kernel, block_r=block_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, d), jnp.float32),
        interpret=interpret,
    )(chunk_base, n_chunks, seg_rep, scale_rep, rows_padded)
    return out


def _broadcast_lanes(v, n_blocks, block_e):
    """[E_pad] -> the (n_blocks, 8, block_e) layout the kernels stream."""
    return jnp.broadcast_to(
        v.reshape(n_blocks, 1, block_e), (n_blocks, 8, block_e))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sorted_sddmm(data_sorted, rows, plan: SortedPlan, interpret=False):
    """Masked per-edge dot ``out[e] = <data_e, rows[recv(e)]>`` -> [E_pad] f32.

    ``data_sorted``: [E_pad, D] per-edge vectors in plan order (f32 or
    bf16).  ``rows``: [num_segments, D] receiver-space rows.  Padded edges
    return 0.  Differentiable in both operands:

      d_data[e] = g[e] * rows[recv(e)]    (scaled-gather kernel)
      d_rows[r] = sum_{e: recv(e)=r} g[e] * data_e
                                          (existing fused-weight kernel)

    Reference parity targets: the per-edge einsum at
    ``/root/reference/Modules/gnn_utils.py:208`` and
    ``.../BipartiteClassification/Models/HGNN_GMM.py:188`` (with the
    endpoint row already materialized as edge data, which is how edge
    tensors live in sorted-native mode).
    """
    out, _ = _sddmm_fwd(data_sorted, rows, plan, interpret)
    return out


def _sddmm_forward(data_sorted, rows, plan, interpret):
    from hierarchicalgnn_tpu.ops.segment import segment_sum  # noqa: F401

    def xla(_):
        idx = jnp.minimum(plan.receivers_sorted, plan.num_segments - 1)
        out = jnp.sum(data_sorted.astype(jnp.float32)
                      * rows.astype(jnp.float32)[idx], axis=-1)
        return jnp.where(plan.edge_mask_sorted, out, 0.0)

    def kernel(_):
        out = _pallas_sddmm(
            data_sorted, rows.astype(jnp.float32), plan.seg_rep,
            plan.chunk_base, plan.n_chunks, plan.num_segments, plan.block_r,
            plan.block_e, plan.c_max, interpret)
        # never-visited all-padding tail blocks hold undefined values
        return jnp.where(plan.edge_mask_sorted, out, 0.0)

    return jax.lax.cond(plan.overflowed, xla, kernel, None)


def _sddmm_fwd(data_sorted, rows, plan, interpret):
    out = _sddmm_forward(data_sorted, rows, plan, interpret)
    return out, (data_sorted, rows, plan)


def _sddmm_bwd(interpret, residuals, g):
    data_sorted, rows, plan = residuals
    g = jnp.where(plan.edge_mask_sorted, g, 0.0)
    d_data = scaled_gather(g, rows, plan, interpret).astype(data_sorted.dtype)
    d_rows = sorted_aggregate_weighted(
        data_sorted, g, plan, interpret).astype(rows.dtype)
    return d_data, d_rows, None


sorted_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def scaled_gather_raw(scale, rows, seg_rep, chunk_base, n_chunks,
                      receivers_sorted, mask_sorted, overflowed,
                      num_segments, block_r, block_e, c_max,
                      interpret=False):
    """:func:`scaled_gather` on raw plan components (for VJPs whose
    residuals don't carry a :class:`SortedPlan` object)."""
    e_pad = mask_sorted.shape[0]
    n_blocks = e_pad // block_e
    if scale is None:
        scale = jnp.ones((e_pad,), jnp.float32)
    scale = jnp.where(mask_sorted, scale.reshape(e_pad).astype(jnp.float32),
                      0.0)

    def xla(_):
        idx = jnp.minimum(receivers_sorted, num_segments - 1)
        return scale[:, None] * rows.astype(jnp.float32)[idx]

    def kernel(_):
        out = _pallas_scaled_gather(
            _broadcast_lanes(scale, n_blocks, block_e),
            rows.astype(jnp.float32), seg_rep, chunk_base, n_chunks,
            num_segments, block_r, block_e, c_max, interpret)
        return jnp.where(mask_sorted[:, None], out, 0.0)

    return jax.lax.cond(overflowed, xla, kernel, None)


def scaled_gather(scale, rows, plan: SortedPlan, interpret=False):
    """``out[e, :] = scale[e] * rows[recv(e), :]`` in plan order (f32).

    The receiver-row gather as a one-hot MXU matmul (rows stream once per
    group instead of once per edge).  ``scale=None`` gives the plain
    gather -- the kernel-backed backward of :func:`sorted_aggregate`.
    No autodiff (used inside VJPs).
    """
    return scaled_gather_raw(
        scale, rows, plan.seg_rep, plan.chunk_base, plan.n_chunks,
        plan.receivers_sorted, plan.edge_mask_sorted, plan.overflowed,
        plan.num_segments, plan.block_r, plan.block_e, plan.c_max, interpret)
