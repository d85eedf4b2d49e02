"""Sorted-native Pallas aggregation vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
    build_sorted_plan, sorted_aggregate,
)
from hierarchicalgnn_tpu.ops.segment import segment_sum


def problem(rng, n_nodes, n_edges, e_pad, dim, skew=False):
    if skew:
        hot = rng.integers(0, max(n_nodes // 20, 1), n_edges // 2)
        cold = rng.integers(0, n_nodes, n_edges - len(hot))
        receivers = np.concatenate([hot, cold]).astype(np.int32)
    else:
        receivers = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    senders = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    mask = np.zeros(e_pad, bool)
    mask[:n_edges] = True
    rpad = np.pad(receivers, (0, e_pad - n_edges))
    spad = np.pad(senders, (0, e_pad - n_edges))
    data = rng.normal(size=(e_pad, dim)).astype(np.float32)
    return (jnp.array(spad), jnp.array(rpad), jnp.array(mask),
            jnp.array(data))


@pytest.mark.parametrize("n_nodes,n_edges,e_pad,dim,c_max", [
    (512, 2000, 2048, 128, None),
    (300, 1500, 2048, 128, None),      # ragged num_segments
    (1024, 100, 1024, 256, None),      # sparse, empty groups
    (256, 1024, 1024, 128, 8),         # explicit chunk budget
])
def test_matches_xla(rng, n_nodes, n_edges, e_pad, dim, c_max):
    s, r, mask, data = problem(rng, n_nodes, n_edges, e_pad, dim)
    plan = build_sorted_plan(s, r, mask, n_nodes, block_r=128, block_e=128,
                             c_max=c_max)
    assert not bool(plan.overflowed)
    out = sorted_aggregate(plan.sort(data), plan, interpret=True)
    expected = segment_sum(data, r, n_nodes, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-4)


def test_skewed_overflow_fallback(rng):
    s, r, mask, data = problem(rng, 512, 2048, 2048, 128, skew=True)
    plan = build_sorted_plan(s, r, mask, 512, block_r=128, block_e=128,
                             c_max=2)
    assert bool(plan.overflowed)
    out = sorted_aggregate(plan.sort(data), plan, interpret=True)
    expected = segment_sum(data, r, 512, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-3)


def test_sort_unsort_roundtrip(rng):
    s, r, mask, data = problem(rng, 128, 500, 512, 128)
    plan = build_sorted_plan(s, r, mask, 128, block_r=128, block_e=128)
    # roundtrip restores valid rows; invalid rows are zero-filled by sort()
    rt = np.asarray(plan.unsort(plan.sort(data)))
    m0 = np.asarray(mask)
    np.testing.assert_array_equal(rt[m0], np.asarray(data)[m0])
    assert (rt[~m0] == 0).all()
    # sorted receivers ascending among valid
    rs = np.asarray(plan.receivers_sorted)
    ms = np.asarray(plan.edge_mask_sorted)
    valid = rs[ms]
    assert (np.diff(valid) >= 0).all()
    # senders travel with their edges (invalid slots zero-filled)
    expect = np.asarray(s)[np.asarray(plan.perm)]
    np.testing.assert_array_equal(np.asarray(plan.senders_sorted)[ms],
                                  expect[ms])


def test_gradient(rng):
    s, r, mask, data = problem(rng, 256, 800, 1024, 128)
    plan = build_sorted_plan(s, r, mask, 256, block_r=128, block_e=128)
    ds = plan.sort(data)

    def f(d):
        return jnp.sum(sorted_aggregate(d, plan, interpret=True) ** 2)

    def f_ref(d):
        return jnp.sum(segment_sum(plan.unsort(d), r, 256, mask=mask) ** 2)

    g = jax.grad(f)(ds)
    g_ref = jax.grad(f_ref)(ds)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_sorted_segment_min(rng):
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import sorted_segment_min_i32
    from hierarchicalgnn_tpu.ops.segment import segment_min
    s, r, mask, _ = problem(rng, 256, 900, 1024, 128)
    vals = rng.integers(0, 10000, 1024).astype(np.int32)
    plan = build_sorted_plan(s, r, mask, 256, block_r=128, block_e=128)
    int_max = np.iinfo(np.int32).max
    vs = np.asarray(plan.sort(jnp.asarray(vals)))
    vs = np.where(np.asarray(plan.edge_mask_sorted), vs, int_max)
    out = sorted_segment_min_i32(jnp.asarray(vs), plan, interpret=True)
    expected = segment_min(jnp.asarray(vals), r, 256, mask=mask,
                           empty_value=int_max)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_connected_components_sorted_matches(rng):
    from hierarchicalgnn_tpu.ops.connected import (
        connected_components, connected_components_sorted,
    )
    n = 256
    # bidirected random graph
    e = 300
    a = rng.integers(0, n, e).astype(np.int32)
    b = rng.integers(0, n, e).astype(np.int32)
    s = np.concatenate([a, b])
    r = np.concatenate([b, a])
    mask = np.ones(2 * e, bool)
    # random keep mask applied symmetrically
    keep_half = rng.random(e) < 0.5
    keep = np.concatenate([keep_half, keep_half])
    plan = build_sorted_plan(jnp.asarray(s), jnp.asarray(r),
                             jnp.asarray(mask), n, block_r=128, block_e=128)
    keep_sorted = np.asarray(plan.sort(jnp.asarray(keep)))
    labels = np.asarray(connected_components_sorted(
        plan, jnp.asarray(keep_sorted), n, interpret=True))
    ref = np.asarray(connected_components(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(mask & keep), n))
    for i in range(n):
        for j in range(i + 1, n):
            assert (labels[i] == labels[j]) == (ref[i] == ref[j])


def test_gather_endpoints_backward(rng):
    """gather_edge_endpoints custom VJP == plain-gather autodiff, with and
    without the transposed plan."""
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_transposed_plan, gather_edge_endpoints,
    )
    n, e_pad = 256, 1024
    s, r, mask, _ = problem(rng, n, 900, e_pad, 128)
    nodes = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, n, block_r=128, block_e=128)
    plan_t, r2s = build_transposed_plan(plan, s, r, mask, n)
    w = jnp.asarray(rng.normal(size=(plan.senders_sorted.shape[0],
                                     128)).astype(np.float32))
    m = plan.edge_mask_sorted[:, None]

    def f_ref(x):
        a, b = x[plan.senders_sorted], x[plan.receivers_sorted]
        return jnp.sum(jnp.where(m, a * w + b, 0.0) ** 2)

    def f_kernel(x):
        a, b = gather_edge_endpoints(x, plan, plan_t, r2s, interpret=True)
        return jnp.sum(jnp.where(m, a * w + b, 0.0) ** 2)

    def f_kernel_single(x):
        a, b = gather_edge_endpoints(x, plan, interpret=True)
        return jnp.sum(jnp.where(m, a * w + b, 0.0) ** 2)

    g_ref = jax.grad(f_ref)(nodes)
    np.testing.assert_allclose(np.asarray(jax.grad(f_kernel)(nodes)),
                               np.asarray(g_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.grad(f_kernel_single)(nodes)),
                               np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_bfloat16_data(rng):
    """bf16 edge data rides the kernel with f32 accumulation; the overflow
    fallback and both custom-VJP paths keep dtypes consistent."""
    s, r, m, data = problem(rng, 256, 1000, 1024, 128)
    plan = build_sorted_plan(s, r, m, 256)
    dsb = plan.sort(data.astype(jnp.bfloat16))
    out = sorted_aggregate(dsb, plan, interpret=True)
    assert out.dtype == jnp.float32
    ref = segment_sum(jnp.where(m[:, None], data, 0.0), r, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss(d):
        return jnp.sum(sorted_aggregate(d, plan, interpret=True) ** 2)

    g = jax.grad(loss)(dsb)
    assert g.dtype == jnp.bfloat16

    # overflow branch returns the same dtype as the kernel branch
    # block_e pinned to 512: the overflow scenario needs >1 chunk per
    # row-group, which the (larger) shipped default no longer forces here
    plan_o = build_sorted_plan(s, r, m, 256, c_max=1, block_e=512)
    assert bool(plan_o.overflowed)
    out_o = sorted_aggregate(plan_o.sort(data.astype(jnp.bfloat16)), plan_o,
                             interpret=True)
    assert out_o.dtype == jnp.float32


def test_weighted_aggregate(rng):
    """Fused weighted aggregation (weight inside the one-hot matmul) matches
    the materialized data*w oracle in forward and both gradients, for the
    kernel path, the overflow fallback, and bf16 data."""
    s, r, m, data = problem(rng, 256, 1000, 1024, 128)
    w = jnp.asarray(rng.normal(size=(1024, 1)).astype(np.float32))
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        sorted_aggregate_weighted,
    )

    plan = build_sorted_plan(s, r, m, 256)
    ds, ws = plan.sort(data), plan.sort(w)
    out = sorted_aggregate_weighted(ds, ws, plan, True)
    ref = segment_sum(jnp.where(m[:, None], data * w, 0.0), r, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss(d, w_):
        return jnp.sum(sorted_aggregate_weighted(d, w_, plan, True) ** 2)

    def loss_ref(d, w_):
        o = segment_sum(
            jnp.where(plan.edge_mask_sorted[:, None], d * w_, 0.0),
            plan.receivers_sorted, 256, indices_are_sorted=True)
        return jnp.sum(o ** 2)

    gd, gw = jax.grad(loss, argnums=(0, 1))(ds, ws)
    gd_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(ds, ws)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-3)

    out_b = sorted_aggregate_weighted(ds.astype(jnp.bfloat16), ws, plan, True)
    assert out_b.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)

    # block_e pinned to 512: the overflow scenario needs >1 chunk per
    # row-group, which the (larger) shipped default no longer forces here
    plan_o = build_sorted_plan(s, r, m, 256, c_max=1, block_e=512)
    assert bool(plan_o.overflowed)
    out_o = sorted_aggregate_weighted(plan_o.sort(data), plan_o.sort(w),
                                      plan_o, True)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(ref), atol=1e-4)
