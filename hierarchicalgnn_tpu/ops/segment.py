"""Segment reductions: the sparse-aggregation core of every GNN layer.

The reference delegates all message aggregation to torch_scatter
``scatter_add/mean/min/max`` CUDA kernels (reference
``Modules/gnn_utils.py:50,124-125,142-143``, ``Modules/tracking_utils.py:41``).
Here the same contraction is a masked segment reduction over a padded COO
edge array.  Two execution paths:

  * XLA path (this module): ``jax.ops.segment_*`` -- always correct, used as
    the parity oracle and the fallback for small problems.
  * Pallas path (``ops.pallas.sorted_agg``): sorted-native blocked-CSR MXU
    kernels for the training hot loop; model blocks build per-graph plans
    via ``build_sorted_plan`` (``make_aggregator`` below offers the
    gather-layout variant for ad hoc callers).

Padded edges contribute the reduction identity (0 for sum/mean, +/-inf for
min/max) and padded nodes receive the identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INT_MIN = jnp.iinfo(jnp.int32).min
_INT_MAX = jnp.iinfo(jnp.int32).max


def _apply_mask(data, mask, fill):
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, fill)


def segment_sum(data, segment_ids, num_segments, mask=None, indices_are_sorted=False):
    """sum_{e: seg[e]=i} data[e] -> [num_segments, ...]."""
    data = _apply_mask(data, mask, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments, mask=None, indices_are_sorted=False):
    """Masked segment mean; empty segments yield 0 (torch_scatter semantics)."""
    total = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    counts = segment_sum(ones, segment_ids, num_segments, mask, indices_are_sorted)
    counts = counts.reshape(counts.shape + (1,) * (total.ndim - counts.ndim))
    return total / jnp.maximum(counts, 1)


def segment_max(data, segment_ids, num_segments, mask=None, empty_value=0.0):
    """Masked segment max; empty segments yield ``empty_value``."""
    if jnp.issubdtype(data.dtype, jnp.integer):
        neutral = _INT_MIN
    else:
        neutral = -jnp.inf
    data = _apply_mask(data, mask, neutral)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(out == neutral, jnp.asarray(empty_value, out.dtype), out)


def segment_min(data, segment_ids, num_segments, mask=None, empty_value=0.0):
    """Masked segment min; empty segments yield ``empty_value``."""
    if jnp.issubdtype(data.dtype, jnp.integer):
        neutral = _INT_MAX
    else:
        neutral = jnp.inf
    data = _apply_mask(data, mask, neutral)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(out == neutral, jnp.asarray(empty_value, out.dtype), out)


def segment_count(segment_ids, num_segments, mask=None):
    ones = jnp.ones(segment_ids.shape, dtype=jnp.int32)
    return segment_sum(ones, segment_ids, num_segments, mask)


def gather_segment_sum(values, gather_ids, segment_ids, num_segments,
                       weights=None, mask=None):
    """scatter_add(w_e * values[gather_ids[e]]) into segments.

    The bipartite weighted-graph-convolution message of the hierarchical cell
    (reference ``Modules/gnn_utils.py:124,142``): gather node rows by edge
    endpoint, scale by per-edge weights, reduce to the other endpoint.
    The gather runs in XLA (it fuses with the multiply); the reduction goes
    through :func:`segment_sum` so the Pallas hot path can slot in.
    """
    msgs = values[gather_ids]
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (msgs.ndim - weights.ndim))
        msgs = msgs * w
    return segment_sum(msgs, segment_ids, num_segments, mask)


# ---------------------------------------------------------------------------
# Hot-path dispatch.  Model code builds one aggregator per graph direction
# per forward (the Pallas blocked-CSR layout depends only on structure, so
# it is shared across all message-passing iterations); ``use_pallas`` is
# toggled by the model config.
# ---------------------------------------------------------------------------


def make_aggregator(receivers, edge_mask, num_segments, use_pallas=False):
    """Returns ``agg(data) -> [num_segments, D]`` for repeated masked segment
    sums over a fixed edge structure.

    With ``use_pallas`` the blocked-CSR layout is built once here and every
    call runs the MXU one-hot kernel (ops/pallas/segment_kernel.py), falling
    back to XLA scatter for non-lane-aligned feature widths or chunk-budget
    overflow.
    """
    if not use_pallas:
        def agg(data):
            return segment_sum(data, receivers, num_segments, mask=edge_mask)
        return agg

    from hierarchicalgnn_tpu.ops.pallas.segment_kernel import (
        csr_segment_sum, make_csr_layout,
    )

    layout = make_csr_layout(receivers, edge_mask, num_segments)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted

    def agg(data):
        if data.shape[-1] % 128 != 0:
            return segment_sum(data, receivers, num_segments, mask=edge_mask)
        return jax.lax.cond(
            layout.overflowed,
            lambda d: segment_sum(
                jnp.where(edge_mask[:, None], d, 0.0), receivers,
                num_segments),
            lambda d: csr_segment_sum(d, layout, interpret=interpret),
            data)

    return agg
