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
    """Returns {f32, bf16, xla_f32} weighted-aggregation edges/s.

    The headline value is the FRAMEWORK path (sorted-native fused kernel),
    not min(framework, baseline) -- a kernel regression must show up in the
    metric, not be masked by the fallback.
    """
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

    # bf16 data path (the shipped BC fast operating point): edge features
    # ride at half the HBM traffic; the kernel accumulates in f32.
    data_bf16 = data_sorted.astype(jnp.bfloat16)
    w_bf16 = w_sorted.astype(jnp.bfloat16)

    def agg_op_bf16(i, d):
        w = w_bf16 * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
        return sorted_aggregate_weighted(d, w, plan, interpret)[0, 0]

    t_bf16 = _timed_loop(agg_op_bf16, data_bf16)

    return {
        "f32": N_EDGES / t_agg,
        "bf16": N_EDGES / t_bf16,
        "xla_f32": N_EDGES / t_xla,
    }


def bench_sddmm(seed=0):
    """edge_cosine_likelihood throughput (the clustering SDDMM, reference
    ``Modules/BipartiteClassification/Models/HGNN_GMM.py:188``) plus a
    latent-width edge_dot (the dynamic-graph logits,
    ``Modules/gnn_utils.py:208``)."""
    from hierarchicalgnn_tpu.ops.sddmm import edge_cosine_likelihood, edge_dot

    rng = np.random.default_rng(seed)
    senders = jnp.asarray(rng.integers(0, N_NODES, N_EDGES).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, N_NODES, N_EDGES).astype(np.int32))
    mask = jnp.ones((N_EDGES,), bool)
    emb = rng.normal(size=(N_NODES, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    emb = jnp.asarray(emb)
    feat = jnp.asarray(rng.normal(size=(N_NODES, DIM)), jnp.float32)

    def cos_op(i, e):
        out = edge_cosine_likelihood(
            e * (1.0 + i.astype(jnp.float32) * 1e-6), senders, receivers,
            mask=mask)
        return out[0]

    t_cos = _timed_loop(cos_op, emb)

    def dot_op(i, f):
        out = edge_dot(f * (1.0 + i.astype(jnp.float32) * 1e-6), f,
                       senders, receivers, mask=mask)
        return out[0]

    t_dot = _timed_loop(dot_op, feat)
    return {"cosine_emb8": N_EDGES / t_cos, f"dot_d{DIM}": N_EDGES / t_dot}


def main():
    spmm = bench_spmm()
    sddmm = bench_sddmm()
    report = {
        "spmm_edges_per_s": {k: round(v) for k, v in spmm.items()},
        "sddmm_edges_per_s": {k: round(v) for k, v in sddmm.items()},
        "shape": {"n_nodes": N_NODES, "n_edges": N_EDGES, "dim": DIM},
        "backend": jax.default_backend(),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "metric": "spmm_edges_per_s_per_chip",
        "value": round(spmm["f32"]),          # framework path, NOT min()
        "unit": "edges/s",
        "vs_baseline": round(spmm["f32"] / spmm["xla_f32"], 4),
        "bf16_edges_per_s": round(spmm["bf16"]),
        "sddmm_cosine_edges_per_s": round(sddmm["cosine_emb8"]),
    }))


if __name__ == "__main__":
    main()
