"""Pallas TPU segment-sum: one-hot MXU aggregation over a blocked-CSR layout.

The XLA scatter-add path for GNN message aggregation runs far from memory
speed-of-light on TPU (scatter serializes; measured ~230 GB/s vs ~820 GB/s
HBM on v5e).  This kernel reformulates segment summation as a sequence of
small dense matmuls -- the classic "sparse on dense hardware" trick:

  1. Edges are binned by destination row-group (BLOCK_R rows per group)
     into a regular layout: each group owns C_MAX chunks of BLOCK_E edge
     slots; unused slots carry a sentinel segment id.
  2. The kernel walks grid (group, chunk).  For each chunk it builds a
     one-hot matrix  onehot[e, r] = (seg_local[e] == r)  and accumulates
     onehot^T @ data  (a BLOCK_E x BLOCK_R x D MXU contraction) into the
     group's output rows, which stay resident in VMEM across chunks.

The layout depends only on graph structure, so one layout build (a sort +
cumsum) serves every aggregation over the same graph -- all message-passing
iterations of a forward/backward pass.  The backward of segment-sum is a
gather (cotangent[receivers]), wired in via custom VJP so the layout's
scatter never appears in the autodiff graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tile sizes: BLOCK_E x BLOCK_R one-hot contraction on the MXU.
BLOCK_E = 512
BLOCK_R = 256


@struct.dataclass
class CSRLayout:
    """Blocked-CSR gather plan for a fixed graph structure.

    ``num_segments`` is static metadata (not a pytree leaf) so it survives
    jit boundaries as a python int usable in grid/shape computations.
    """

    perm: jnp.ndarray        # int32[G*C_MAX*BLOCK_E] gather index into edges
    perm_valid: jnp.ndarray  # bool[G*C_MAX*BLOCK_E]
    seg_local: jnp.ndarray   # int32[G*C_MAX*BLOCK_E] in [0, BLOCK_R]; BLOCK_R = pad
    receivers: jnp.ndarray   # original [E_pad] segment ids (for the VJP gather)
    edge_mask: jnp.ndarray   # original [E_pad] validity
    overflowed: jnp.ndarray  # bool[] -- some group exceeded its chunk budget
    num_segments: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.perm.shape[0]


@functools.partial(jax.jit, static_argnames=("num_segments", "block_r",
                                             "block_e", "c_max"))
def make_csr_layout(receivers, edge_mask, num_segments, block_r=BLOCK_R,
                    block_e=BLOCK_E, c_max=None) -> CSRLayout:
    """Bin edges by destination row-group into the regular chunked layout.

    ``c_max`` (chunks per group) defaults to 2x the uniform requirement --
    enough slack for the k-bounded degree distributions of TrackML graphs.
    If a group still overflows, ``overflowed`` is set and the dispatcher
    falls back to the XLA path for correctness.
    """
    receivers = receivers.astype(jnp.int32)
    e_pad = receivers.shape[0]
    n_groups = -(-num_segments // block_r)
    if c_max is None:
        uniform = max(1, -(-e_pad // (n_groups * block_e)))
        c_max = 2 * uniform
    cap_per_group = c_max * block_e

    group = jnp.where(edge_mask, receivers // block_r, n_groups)
    order = jnp.argsort(group, stable=True).astype(jnp.int32)
    sorted_group = group[order]
    sorted_valid = sorted_group < n_groups

    counts = jax.ops.segment_sum(
        jnp.ones_like(group), group, num_segments=n_groups + 1)[:n_groups]
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(e_pad, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_group, n_groups - 1)].astype(jnp.int32)
    dest = sorted_group * cap_per_group + rank
    in_budget = sorted_valid & (rank < cap_per_group)

    capacity = n_groups * cap_per_group
    scatter_to = jnp.where(in_budget, dest, capacity)  # drop out-of-budget
    perm = jnp.zeros((capacity,), jnp.int32).at[scatter_to].set(
        order, mode="drop")
    perm_valid = jnp.zeros((capacity,), bool).at[scatter_to].set(
        True, mode="drop")
    seg_vals = receivers[order] - sorted_group * block_r
    seg_local = jnp.full((capacity,), block_r, jnp.int32).at[scatter_to].set(
        jnp.where(in_budget, seg_vals, block_r), mode="drop")
    # 8x sublane replication: gives the kernel a (8, BLOCK_E)-tileable seg
    # block with the edge axis on lanes, so the one-hot is built directly in
    # the transposed (rows x edges) layout the MXU contraction wants.
    seg_rep = jnp.broadcast_to(
        seg_local.reshape(capacity // block_e, 1, block_e),
        (capacity // block_e, 8, block_e))

    overflowed = jnp.any(counts > cap_per_group)
    return CSRLayout(perm=perm, perm_valid=perm_valid, seg_local=seg_rep,
                     receivers=receivers, edge_mask=edge_mask,
                     num_segments=num_segments, overflowed=overflowed)


def _segment_kernel(seg_ref, data_ref, out_ref, *, block_r):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # seg block (1, 8, BLOCK_E): segment ids on lanes (8x sublane-replicated
    # for tiling legality).  Build the one-hot directly transposed --
    # onehot_T[r, e] = (seg[e] == r) -- so the contraction below is a
    # natural (R x E) @ (E x D) MXU matmul with no relayout.
    seg = seg_ref[0, 0:1, :]  # (1, BLOCK_E); block_r marks padding
    block_e = seg.shape[1]
    onehot_t = (jnp.broadcast_to(seg, (block_r, block_e))
                == jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e),
                                            0)).astype(data_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        onehot_t, data_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pallas_aggregate(data_padded, seg_rep, num_segments, block_r, block_e,
                      interpret=False):
    capacity, d = data_padded.shape
    n_groups = -(-num_segments // block_r)
    c_max = capacity // (n_groups * block_e)
    n_rows = n_groups * block_r

    out = pl.pallas_call(
        functools.partial(_segment_kernel, block_r=block_r),
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e), lambda g, c: (g * c_max + c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, d), lambda g, c: (g * c_max + c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda g, c: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
    )(seg_rep, data_padded)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _csr_segment_sum(data, perm, perm_valid, seg_local, receivers, edge_mask,
                     num_segments, block_r, block_e, interpret):
    gathered = jnp.where(perm_valid[:, None], data[perm], 0.0)
    return _pallas_aggregate(gathered, seg_local, num_segments, block_r,
                             block_e, interpret)


def _csr_fwd(data, perm, perm_valid, seg_local, receivers, edge_mask,
             num_segments, block_r, block_e, interpret):
    out = _csr_segment_sum(data, perm, perm_valid, seg_local, receivers,
                           edge_mask, num_segments, block_r, block_e,
                           interpret)
    return out, (receivers, edge_mask)


def _csr_bwd(num_segments, block_r, block_e, interpret, residuals, g):
    receivers, edge_mask = residuals
    grad = jnp.where(edge_mask[:, None], g[receivers], 0.0)
    return grad, None, None, None, None, None


_csr_segment_sum.defvjp(_csr_fwd, _csr_bwd)


def csr_segment_sum(data, layout: CSRLayout, block_r=BLOCK_R, block_e=BLOCK_E,
                    interpret=False):
    """Masked segment sum of edge ``data`` via the Pallas MXU kernel."""
    return _csr_segment_sum(
        data, layout.perm, layout.perm_valid, layout.seg_local,
        layout.receivers, layout.edge_mask, layout.num_segments,
        block_r, block_e, interpret)


def sorted_segment_sum_auto(data, segment_ids, num_segments, mask=None,
                            interpret=False):
    """One-shot API: build the layout and aggregate (bench/simple callers).

    Model code should build the layout once per graph via
    :func:`make_csr_layout` and call :func:`csr_segment_sum` per iteration.
    Falls back to the XLA path when the feature width doesn't tile (lane
    dim must divide 128) or the layout overflowed its chunk budget.
    """
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    if mask is None:
        mask = jnp.ones(segment_ids.shape, bool)
    if data.shape[-1] % 128 != 0:
        return segment_sum(data, segment_ids, num_segments, mask)
    layout = make_csr_layout(segment_ids, mask, num_segments)
    return jax.lax.cond(
        layout.overflowed,
        lambda: segment_sum(jnp.where(mask[:, None], data, 0.0), segment_ids,
                            num_segments),
        lambda: csr_segment_sum(data, layout, interpret=interpret),
    )
