"""Sorted-native Pallas SDDMM vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.ops.pallas.sorted_agg import build_sorted_plan
from hierarchicalgnn_tpu.ops.pallas.sddmm_kernel import (
    scaled_gather, sorted_sddmm)

from test_sorted_agg import problem


def oracle(data_sorted, rows, plan):
    idx = np.minimum(np.asarray(plan.receivers_sorted), rows.shape[0] - 1)
    out = np.sum(np.asarray(data_sorted, np.float32)
                 * np.asarray(rows)[idx], axis=-1)
    return np.where(np.asarray(plan.edge_mask_sorted), out, 0.0)


@pytest.mark.parametrize("n_nodes,n_edges,e_pad,dim,c_max", [
    (512, 2000, 2048, 128, None),
    (300, 1500, 2048, 128, None),      # ragged num_segments
    (1024, 100, 1024, 256, None),      # sparse: empty groups, padding tail
    (256, 1024, 1024, 128, 8),         # explicit chunk budget
])
def test_sddmm_matches_xla(rng, n_nodes, n_edges, e_pad, dim, c_max):
    s, r, mask, data = problem(rng, n_nodes, n_edges, e_pad, dim)
    rows = jnp.asarray(rng.normal(size=(n_nodes, dim)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, n_nodes, block_r=128, block_e=128,
                             c_max=c_max)
    assert not bool(plan.overflowed)
    ds = plan.sort(data)
    out = sorted_sddmm(ds, rows, plan, True)
    np.testing.assert_allclose(np.asarray(out), oracle(ds, rows, plan),
                               rtol=1e-5, atol=1e-4)


def test_sddmm_overflow_fallback(rng):
    s, r, mask, data = problem(rng, 512, 2048, 2048, 128, skew=True)
    rows = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, 512, block_r=128, block_e=128,
                             c_max=2)
    assert bool(plan.overflowed)
    ds = plan.sort(data)
    out = sorted_sddmm(ds, rows, plan, True)
    np.testing.assert_allclose(np.asarray(out), oracle(ds, rows, plan),
                               rtol=1e-4, atol=1e-3)


def test_sddmm_gradients(rng):
    s, r, mask, data = problem(rng, 256, 800, 1024, 64)
    rows = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, 256, block_r=128, block_e=128)
    ds = plan.sort(data)
    cot = jnp.asarray(rng.normal(size=(1024,)).astype(np.float32))

    def f_kernel(d, y):
        return jnp.sum(sorted_sddmm(d, y, plan, True) * cot)

    def f_ref(d, y):
        idx = jnp.minimum(plan.receivers_sorted, 255)
        out = jnp.sum(d * y[idx], axis=-1)
        out = jnp.where(plan.edge_mask_sorted, out, 0.0)
        return jnp.sum(out * cot)

    gd_k, gy_k = jax.grad(f_kernel, argnums=(0, 1))(ds, rows)
    gd_r, gy_r = jax.grad(f_ref, argnums=(0, 1))(ds, rows)
    np.testing.assert_allclose(np.asarray(gd_k), np.asarray(gd_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_k), np.asarray(gy_r),
                               rtol=1e-5, atol=1e-4)


def test_sddmm_bf16_data(rng):
    s, r, mask, data = problem(rng, 256, 900, 1024, 128)
    rows = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, 256, block_r=128, block_e=128)
    ds = plan.sort(data).astype(jnp.bfloat16)
    out = sorted_sddmm(ds, rows, plan, True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), oracle(ds, rows, plan),
                               rtol=2e-2, atol=2e-2)
    # cotangent dtype follows the primal
    g = jax.grad(lambda d: jnp.sum(sorted_sddmm(d, rows, plan, True)))(ds)
    assert g.dtype == jnp.bfloat16


def test_scaled_gather_matches(rng):
    s, r, mask, _ = problem(rng, 300, 1200, 2048, 64)
    rows = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(2048,)).astype(np.float32))
    plan = build_sorted_plan(s, r, mask, 300, block_r=128, block_e=128)
    out = scaled_gather(plan.sort(scale), rows, plan, True)
    idx = np.minimum(np.asarray(plan.receivers_sorted), 299)
    sc = np.asarray(plan.sort(scale))
    expected = np.where(np.asarray(plan.edge_mask_sorted)[:, None],
                        sc[:, None] * np.asarray(rows)[idx], 0.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                               atol=1e-4)
    # scale=None -> plain gather
    out1 = scaled_gather(None, rows, plan, True)
    expected1 = np.where(np.asarray(plan.edge_mask_sorted)[:, None],
                         np.asarray(rows)[idx], 0.0)
    np.testing.assert_allclose(np.asarray(out1), expected1, rtol=1e-5,
                               atol=1e-4)


def test_sorted_cosine_matches_gather_form():
    """The kernel-backed cosine likelihood (endpoint gather + fused VPU
    dot, the round-5 clustering formulation in models/blocks.py) equals
    the XLA gather form exactly.  Reference parity target:
    ``Modules/BipartiteClassification/Models/HGNN_GMM.py:188-189``."""
    import jax

    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, build_transposed_plan, gather_edge_endpoints)
    from hierarchicalgnn_tpu.ops.sddmm import (
        cosine_from_endpoints, edge_cosine_likelihood, normalize_unit_f32)

    key = jax.random.key(0)
    ks, kr, ke = jax.random.split(key, 3)
    n, e = 256, 2048
    s = jax.random.randint(ks, (e,), 0, n, jnp.int32)
    r = jax.random.randint(kr, (e,), 0, n, jnp.int32)
    m = jnp.arange(e) % 5 != 0
    emb = jax.random.normal(ke, (n, 8))
    plan = build_sorted_plan(s, r, m, n)
    plan_t, r2s = build_transposed_plan(plan, s, r, m, n)
    x_s, x_r = gather_edge_endpoints(normalize_unit_f32(emb), plan, plan_t,
                                     r2s, interpret=True)
    got = cosine_from_endpoints(x_s, x_r, mask=plan.edge_mask_sorted)
    want = edge_cosine_likelihood(emb, plan.senders_sorted,
                                  plan.receivers_sorted,
                                  mask=plan.edge_mask_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
