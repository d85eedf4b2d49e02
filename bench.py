"""Benchmark: SpMM aggregation throughput (edges/s/chip) + model step time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (driver-defined north star, BASELINE.json): edges/s/chip for
the segment-sum aggregation at BC-HGNN-GMM workload shape (latent 256).
``vs_baseline`` is the speedup of the best path over the plain XLA
scatter-add path on the same device (the reference's torch_scatter
equivalent baseline; the reference repo publishes no numbers of its own --
see BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_spmm(n_nodes=65536, n_edges=524288, dim=256, seed=0):
    from hierarchicalgnn_tpu.ops.segment import segment_sum, segment_sum_hot

    rng = np.random.default_rng(seed)
    # sorted-by-receiver COO, TrackML-like degree distribution
    receivers = np.sort(rng.integers(0, n_nodes, n_edges)).astype(np.int32)
    data = jnp.asarray(rng.normal(size=(n_edges, dim)), jnp.float32)
    seg = jnp.asarray(receivers)

    xla = jax.jit(lambda d, s: segment_sum(
        d, s, n_nodes, indices_are_sorted=True))
    t_xla = _bench(xla, data, seg)

    hot = jax.jit(lambda d, s: segment_sum_hot(
        d, s, n_nodes, indices_are_sorted=True))
    t_hot = _bench(hot, data, seg)

    t_best = min(t_xla, t_hot)
    return n_edges / t_best, n_edges / t_xla


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
