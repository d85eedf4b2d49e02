"""Grid vs brute-force kNN at TrackML full-event scale, on the real chip.

VERDICT r4 ask 2 acceptance: >=3x over brute force at ~1e5 points, plus a
flagship-style anchor on a >=100k-hit event (a NEW size bucket: the
reference's real regime is ~100k hits/event, ``/root/reference/
README.md:65``; its FRNN grid kNN is ``Modules/utils.py:228-239``).

Two parts:
  A. kernel-level: ``ops.knn`` (blockwise brute MXU) vs ``ops.grid_knn``
     (cell-blocked + exactness certificate) on a clustered unit-sphere
     cloud at N=131072, d=8, k=100, r=1.0 -- the embedding-mining shape.
  B. step-level: the Embedding-IN train step at the 131k-hit size bucket
     with ``knn_backend`` brute vs grid (the mining kNN is the quadratic
     term; everything else is linear in N).

Timing follows bench.py: fori_loop inside one jit, scalar readback,
1-iter calibration subtracted (axon: block_until_ready does not block).

Usage (single-tenant chip): python scripts/bench_grid_knn.py \
    [--n 131072] [--iters 8] [--skip-step] [--out benchmarks/grid_knn_r05.json]
"""

import argparse
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
import numpy as np

_T0 = time.perf_counter()


def _status(msg):
    print(f"[grid-knn +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _time_loop(op, label, *args, iters=8):
    @jax.jit
    def f(n, *a):
        def body(i, acc):
            return acc + op(i, *a)
        return jax.lax.fori_loop(0, n, body, 0.0)

    _status(f"compiling {label}")
    float(f(1, *args))
    _status(f"{label} compiled; timing")
    t0 = time.perf_counter()
    float(f(iters, *args))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(1, *args))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def bench_kernel(n, k, r_max, iters, n_cells, n_probe, batch_cells):
    from hierarchicalgnn_tpu.ops.grid_knn import grid_knn
    from hierarchicalgnn_tpu.ops.knn import knn

    @jax.jit
    def prep(key):
        kc, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (2048, 8))
        centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
        assign = jax.random.randint(ka, (n,), 0, 2048, jnp.int32)
        pts = centers[assign] + 0.05 * jax.random.normal(kn, (n, 8))
        return pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    pts = prep(jax.random.key(0))

    def brute_op(i, p):
        p = p * (1.0 + i.astype(jnp.float32) * 1e-6)
        idx, d2 = knn(p, p, k, r_max, block_size=1024)
        return jnp.sum(d2[0].astype(jnp.float32) *
                       jnp.isfinite(d2[0]).astype(jnp.float32))

    def grid_op(i, p):
        p = p * (1.0 + i.astype(jnp.float32) * 1e-6)
        idx, d2, exact = grid_knn(p, p, k, r_max, n_cells=n_cells,
                                  n_probe=n_probe, batch_cells=batch_cells)
        return (jnp.sum(d2[0].astype(jnp.float32) *
                        jnp.isfinite(d2[0]).astype(jnp.float32))
                + 0.0 * exact.astype(jnp.float32))

    # correctness + certificate on the real input first
    _status("checking the certificate at the anchor shape")
    _, _, exact = jax.jit(lambda p: grid_knn(
        p, p, k, r_max, n_cells=n_cells, n_probe=n_probe,
        batch_cells=batch_cells))(pts)
    exact = bool(exact)
    _status(f"exact={exact}")

    t_grid = _time_loop(grid_op, f"grid(n_cells={n_cells},T={n_probe})",
                        pts, iters=iters)
    t_brute = _time_loop(brute_op, "brute", pts, iters=iters)
    return {"n": n, "k": k, "r_max": r_max, "n_cells": n_cells,
            "n_probe": n_probe, "exact": exact,
            "brute_ms": round(t_brute * 1e3, 3),
            "grid_ms": round(t_grid * 1e3, 3),
            "speedup": round(t_brute / t_grid, 2)}


BUCKET_131K = {
    # The >=100k-hit size bucket (reference full-event regime).
    "n_nodes_max": 131072,
    "n_edges_max": 262144,
    "max_particles": 20480,
    "train_split": [1, 1, 1],
    "use_pallas": True,
    "compute_dtype": "bfloat16",
    # 131k nodes x latent 256 x 6 iters of saved activations exceed the
    # 16G HBM without remat (measured: 24.7G requested)
    "remat": True,
    "knn": 100,
    "knn_block_size": 1024,
}


def bench_step(backend, iters, n_particles, grid_cells, grid_probe):
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.trainer import Trainer

    ov = dict(BUCKET_131K, knn_backend=backend,
              knn_grid_cells=grid_cells, knn_grid_probe=grid_probe)
    hparams, model, pipeline = model_selector("Embedding-IN", ov)
    _status(f"generating ~131k-hit event ({n_particles} particles)")
    raw = generate_event(np.random.default_rng(0), n_particles=n_particles)
    ev = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    _status(f"event nodes={ev.x.shape[0]} edges={int(ev.graph.capacity)} "
            f"true_hits={int(np.asarray(ev.node_mask).sum())}")

    trainer = Trainer(hparams, model, pipeline, run_dir=f"/tmp/knn_{backend}")
    state = trainer.init_state(ev)
    trainer._build_steps()

    # time the packed train step through the trainer's own program
    @jax.jit
    def loop(state, ev, n):
        def body(i, s):
            s2, _ = trainer._train_step_packed(s, ev, 0)
            return s2
        s = jax.lax.fori_loop(0, n, body, state)
        return jnp.sum(jax.tree.leaves(s.params)[0][:1])

    _status(f"compiling {backend} step at 131k bucket")
    float(loop(state, ev, 1))
    t0 = time.perf_counter()
    float(loop(state, ev, iters))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(state, ev, 1))
    t_one = time.perf_counter() - t0
    ms = max((t_many - t_one) / (iters - 1), 1e-9) * 1e3
    _status(f"{backend}: {ms:.1f} ms/step")
    return {"backend": backend, "step_ms": round(ms, 2),
            "nodes": int(ev.x.shape[0])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--r-max", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n-cells", type=int, default=512)
    ap.add_argument("--n-probe", type=int, default=8)
    ap.add_argument("--batch-cells", type=int, default=2)
    ap.add_argument("--step-iters", type=int, default=4)
    ap.add_argument("--particles", type=int, default=18200)
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-kernel", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        _status("WARNING: not on TPU; numbers are not the anchor")
    from hierarchicalgnn_tpu.utils import device_lock
    device_lock.acquire(wait_s=1800.0, status=_status)
    _status("warmup readback")
    float(jnp.zeros(()).sum())

    report = {"metric": "grid_knn_anchor", "backend": jax.default_backend()}
    if not args.skip_kernel:
        report["kernel"] = bench_kernel(
            args.n, args.k, args.r_max, args.iters, args.n_cells,
            args.n_probe, args.batch_cells)
        _status(json.dumps(report["kernel"]))
    if not args.skip_step:
        report["step_131k"] = [
            bench_step("grid", args.step_iters, args.particles,
                       args.n_cells, args.n_probe),
            bench_step("brute", args.step_iters, args.particles,
                       args.n_cells, args.n_probe),
        ]
        g, b = report["step_131k"]
        report["step_speedup"] = round(b["step_ms"] / g["step_ms"], 2)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "grid_knn_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
