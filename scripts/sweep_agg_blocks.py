"""Block-size sweep for the sorted-native weighted aggregation kernel.

The one-hot MXU formulation does ``block_r x E x D`` MACs -- ``block_r``
multiplies the FLOP count over the useful ``E x D`` -- and round-3
measurements show BOTH dtypes near the MXU bound at the shipped
(BLOCK_R=256, BLOCK_E=512):

    f32  1.12 ms  (468M edges/s)   bf16  0.90 ms  (585M edges/s)

Smaller ``block_r`` cuts matmul FLOPs linearly (at the cost of more
row-groups -> more boundary-chunk slop); larger ``block_e`` amortizes
per-step overhead (DMA setup, one-hot build).  This sweep times
``sorted_aggregate_weighted`` on the real chip across the grid and prints
a JSON table; the winner goes into ``BLOCK_R``/``BLOCK_E``.

Usage (single-tenant chip):  python scripts/sweep_agg_blocks.py
"""

import itertools
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

N_NODES = 65536
N_EDGES = 524288
DIM = 256
ITERS = 64


def _status(m):
    print(f"[sweep] {m}", file=sys.stderr, flush=True)


def time_config(block_r, block_e, dtype, key):
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, sorted_aggregate_weighted)

    @jax.jit
    def prep(key):
        ks, kr, kd, kw = jax.random.split(key, 4)
        receivers = jnp.sort(jax.random.randint(
            kr, (N_EDGES,), 0, N_NODES, jnp.int32))
        senders = jax.random.randint(ks, (N_EDGES,), 0, N_NODES, jnp.int32)
        mask = jnp.ones((N_EDGES,), bool)
        plan = build_sorted_plan(senders, receivers, mask, N_NODES,
                                 block_r=block_r, block_e=block_e)
        d = jax.random.normal(kd, (N_EDGES, DIM), jnp.float32)
        w = jax.random.normal(kw, (N_EDGES,), jnp.float32)
        return plan, plan.sort(d).astype(dtype), plan.sort(w).astype(dtype)

    plan, ds, ws = prep(key)

    @jax.jit
    def loop(n, ds, ws, plan):
        def body(i, acc):
            scale = (1.0 + i.astype(ds.dtype)
                     * jnp.asarray(1e-3, ds.dtype))
            out = sorted_aggregate_weighted(ds, ws * scale, plan, False)
            return acc + out[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(1, ds, ws, plan))
    t0 = time.perf_counter()
    float(loop(ITERS, ds, ws, plan))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(1, ds, ws, plan))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-9)


def main():
    _status("warmup readback")
    float(jnp.zeros(()).sum())
    _status("warmup done")
    key = jax.random.key(0)
    rows = []
    for block_r, block_e, dt in itertools.product(
            (64, 128, 256, 512), (512, 1024), ("float32", "bfloat16")):
        dtype = jnp.dtype(dt)
        try:
            t = time_config(block_r, block_e, dtype, key)
        except Exception as e:
            _status(f"r{block_r} e{block_e} {dt}: FAILED {e!r}")
            continue
        row = {"block_r": block_r, "block_e": block_e, "dtype": dt,
               "ms": round(t * 1e3, 3),
               "edges_per_s": round(N_EDGES / t)}
        rows.append(row)
        _status(json.dumps(row))
    rows.sort(key=lambda r: r["ms"])
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
