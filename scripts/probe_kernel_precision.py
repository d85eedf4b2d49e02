"""Probe: numerical fidelity + throughput of the sorted-aggregation kernel
on real TPU hardware, across MXU matmul precisions and block shapes.

Question under test: the one-hot MXU matmul (`ops/pallas/sorted_agg.py`)
feeds f32 edge data through `lax.dot_general` at DEFAULT precision -- on
TPU the MXU multiplies in bf16, so the "f32" kernel path may silently
round the edge features (and fused weights) to bf16.  CPU interpret-mode
parity tests cannot see this (CPU dots are true f32).  This script
measures, on device:

  * max/mean relative error of kernel f32 vs XLA-f32 segment sum
  * the same for the weighted variant
  * throughput at each precision (DEFAULT vs HIGHEST) and block shape

Run only when the chip is otherwise idle (single-tenant).
"""

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

N_NODES = 65536
N_EDGES = 524288
DIM = 256
ITERS = 32


def timed_loop(op, *args, iters=ITERS):
    def make(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                return acc + op(i, *a)
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
    from hierarchicalgnn_tpu.ops.pallas import sorted_agg as sa
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(0)
    receivers = jnp.asarray(
        np.sort(rng.integers(0, N_NODES, N_EDGES)).astype(np.int32))
    senders = jnp.asarray(rng.integers(0, N_NODES, N_EDGES).astype(np.int32))
    mask = jnp.ones((N_EDGES,), bool)
    data = jnp.asarray(rng.normal(size=(N_EDGES, DIM)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(N_EDGES,)), jnp.float32)

    ref = np.asarray(segment_sum(data * w[:, None], receivers, N_NODES,
                                 indices_are_sorted=True))
    ref_unw = np.asarray(segment_sum(data, receivers, N_NODES,
                                     indices_are_sorted=True))
    scale = np.maximum(np.abs(ref), 1e-3)
    scale_unw = np.maximum(np.abs(ref_unw), 1e-3)

    for block_r, block_e in [(256, 512), (128, 512), (256, 1024),
                             (512, 512), (128, 256)]:
        plan = sa.build_sorted_plan(senders, receivers, mask, N_NODES,
                                    block_r=block_r, block_e=block_e)
        if bool(plan.overflowed):
            print(f"br={block_r} be={block_e}: plan overflow, skipped")
            continue
        ds = plan.sort(data)
        ws = plan.sort(w)

        out = np.asarray(sa.sorted_aggregate_weighted(ds, ws, plan))
        err = np.abs(out - ref) / scale
        out_unw = np.asarray(sa.sorted_aggregate(ds, plan))
        err_unw = np.abs(out_unw - ref_unw) / scale_unw

        def op_w(i, d):
            wv = ws * (1.0 + i.astype(jnp.float32) * 1e-6)
            return sa.sorted_aggregate_weighted(d, wv, plan)[0, 0]

        t = timed_loop(op_w, ds)

        ds_bf16 = ds.astype(jnp.bfloat16)
        ws_bf16 = ws.astype(jnp.bfloat16)

        def op_bf16(i, d):
            wv = ws_bf16 * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
            return sa.sorted_aggregate_weighted(d, wv, plan)[0, 0]

        t_bf16 = timed_loop(op_bf16, ds_bf16)

        print(f"br={block_r} be={block_e} c_max={plan.c_max}: "
              f"weighted relerr max={err.max():.2e} mean={err.mean():.2e} | "
              f"unweighted max={err_unw.max():.2e} | "
              f"f32 {N_EDGES/t/1e6:.0f} Medges/s, "
              f"bf16 {N_EDGES/t_bf16/1e6:.0f} Medges/s", flush=True)


if __name__ == "__main__":
    main()
