"""Ablation profiler for the full BC-HGNN-GMM training step on TPU.

Times the flagship training step at reference workload shape
(latent 256, 6 IGNN + 6 HGNN iterations — reference
``Modules/BipartiteClassification/Configs/HGNN_GMM.yaml:31-67``) on a
TrackML-scale synthetic event, then a ladder of ablations that isolates
where the milliseconds go:

  train       full step: forward + loss + backward + optax update
  loss        forward + loss (no grad)
  forward     model.apply only
  fwd_no_hgnn forward with 0 hierarchical iterations (pooling + dynamic
              graphs + supernode init still run)
  fwd_pool    forward with 0 interaction AND 0 hierarchical iterations
              (encoders + GMM pooling + CC + kNN graphs only)

Differences between rungs give the cost of each subsystem.  Timing rides a
``lax.fori_loop`` inside one jit with a scalar readback (the axon tunnel's
``block_until_ready`` returns early; see bench.py), calibrated by
subtracting a 1-iteration run.

Usage:  python scripts/profile_bc_step.py [--dtype bfloat16] [--iters 8]
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

BASE_OVERRIDES = {
    "n_nodes_max": 24576,
    "n_edges_max": 49152,
    "max_clusters": 3072,
    "max_particles": 4096,
    "use_pallas": True,
    "train_split": [1, 1, 1],
}


_REMAT = {"ref": True, "dots": "dots", "none": False}


def build(overrides, dtype, n_particles=3000):
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.optim import make_optimizer

    ov = dict(BASE_OVERRIDES, **overrides)
    if dtype:
        ov["compute_dtype"] = dtype
    hparams, model, pipeline = model_selector("BC-HGNN-GMM", ov)
    rng = np.random.default_rng(0)
    raw = generate_event(rng, n_particles=n_particles)
    batch = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    variables = model.init(jax.random.key(0), batch.x, batch.graph,
                           node_mask=batch.node_mask, training=False)
    variables = dict(variables)
    params = variables.pop("params")
    buffers = variables
    optimizer = make_optimizer(hparams, 1)
    opt_state = optimizer.init(params)
    return model, pipeline, optimizer, params, buffers, opt_state, batch


def timed(fn, iters):
    """Seconds per iteration of jitted fn(k), calibrated against k=1."""
    jitted = jax.jit(fn, static_argnums=0)
    sync = lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    sync(jitted(1))           # warm both compile variants
    sync(jitted(iters + 1))
    t0 = time.perf_counter()
    sync(jitted(1))
    t1 = time.perf_counter()
    sync(jitted(iters + 1))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


def profile(dtype, iters, remat="ref", only=None):
    model, pipeline, optimizer, params, buffers, opt_state, batch = build(
        {"remat": _REMAT[remat]}, dtype)
    results = {}

    def train_k(k):
        def body(i, carry):
            params, buffers, opt_state = carry

            def loss_fn(p):
                loss, (nb, metrics) = pipeline.loss(
                    p, buffers, batch, 0, training=True)
                return loss, nb

            (_, nb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, nb, new_opt

        return jax.lax.fori_loop(0, k, body, (params, buffers, opt_state))

    def loss_k(k):
        def body(i, acc):
            x = batch.x + jnp.float32(i) * 1e-12  # defeat loop hoisting
            b = batch._replace(x=x)
            loss, _ = pipeline.loss(params, buffers, b, 0, training=True)
            return acc + loss

        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    def fwd_k(k):
        def body(i, acc):
            x = batch.x + jnp.float32(i) * 1e-12
            variables = {"params": params, **buffers}
            _, scores, intermediate, _ = model.apply(
                variables, x, batch.graph, node_mask=batch.node_mask,
                training=True, mutable=list(buffers))[0]
            return acc + jnp.sum(scores) + jnp.sum(intermediate)

        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    for name, fn in [("train", train_k), ("loss", loss_k),
                     ("forward", fwd_k)]:
        if only and name not in only:
            continue
        results[name] = timed(fn, iters)
        print(f"{name:12s} {results[name]*1e3:8.1f} ms", flush=True)

    # iteration-count ablations (separate param trees / compiles)
    for name, ov in [("fwd_no_hgnn", {"n_hierarchical_graph_iters": 0}),
                     ("fwd_pool", {"n_hierarchical_graph_iters": 0,
                                   "n_interaction_graph_iters": 0})]:
        if only and name not in only:
            continue
        m2, pl2, _, p2, b2, _, batch2 = build(
            dict(ov, remat=_REMAT[remat]), dtype)

        def fwd2_k(k, m2=m2, p2=p2, b2=b2, batch2=batch2):
            def body(i, acc):
                x = batch2.x + jnp.float32(i) * 1e-12
                variables = {"params": p2, **b2}
                _, scores, intermediate, _ = m2.apply(
                    variables, x, batch2.graph, node_mask=batch2.node_mask,
                    training=True, mutable=list(b2))[0]
                return acc + jnp.sum(scores) + jnp.sum(intermediate)

            return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

        results[name] = timed(fwd2_k, iters)
        print(f"{name:12s} {results[name]*1e3:8.1f} ms", flush=True)

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", default="ref", choices=list(_REMAT))
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of measurements")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    print(f"backend={jax.default_backend()} dtype={args.dtype or 'float32'} "
          f"remat={args.remat}", flush=True)
    results = profile(args.dtype, args.iters, args.remat, only)
    out = {"dtype": args.dtype or "float32", "remat": args.remat,
           "ms": {k: round(v * 1e3, 2) for k, v in results.items()}}
    if not only:
        out["delta_ms"] = {
            "backward+optim": round(
                (results["train"] - results["loss"]) * 1e3, 2),
            "loss_terms": round(
                (results["loss"] - results["forward"]) * 1e3, 2),
            "hgnn_cells": round(
                (results["forward"] - results["fwd_no_hgnn"]) * 1e3, 2),
            "ignn_cells": round(
                (results["fwd_no_hgnn"] - results["fwd_pool"]) * 1e3, 2),
            "pooling+graphs+encoders": round(results["fwd_pool"] * 1e3, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
