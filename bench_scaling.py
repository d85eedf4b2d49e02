"""Scaling-efficiency benchmark: edges/s across mesh sizes.

North-star target (BASELINE.json): >= 80% edges/s scaling efficiency at
1 chip, 1 host, N hosts.  This harness measures the event-DP training-step
throughput of the flagship model at mesh sizes 1, 2, ..., up to the
available device count and reports efficiency vs linear scaling from the
1-device run.

On a pod slice run one process per host after
``hierarchicalgnn_tpu.parallel.distributed.initialize()``.  On a single
dev box it exercises the same code over the virtual CPU mesh (correctness
of the sharded program, not wall-clock):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --cpu --sizes 1,2,4,8
"""

import argparse
import json
import time

import os
import sys

# Self-locating: survives the venv being rebuilt without the editable install.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def measure(mesh_size, hparams_overrides, iters=8):
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.parallel.mesh import make_mesh
    from hierarchicalgnn_tpu.parallel.step import (
        make_dp_train_step, stack_events,
    )
    from hierarchicalgnn_tpu.train.optim import make_optimizer
    from hierarchicalgnn_tpu.train.trainer import Trainer

    hparams, model, pipeline = model_selector("BC-HGNN-GMM",
                                              hparams_overrides)
    rng = np.random.default_rng(0)
    events = []
    for s in range(mesh_size):
        raw = generate_event(np.random.default_rng(s), n_particles=200)
        events.append(jax.tree.map(
            jnp.asarray, preprocess_event(raw, hparams, rng=rng)))
    batch = stack_events(events)

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/scaling")
    state = trainer.init_state(events[0])
    mesh = make_mesh(data=mesh_size, graph=1)
    step = make_dp_train_step(pipeline, make_optimizer(hparams, 8), mesh)

    state, metrics = step(state, batch, 0)  # compile
    float(metrics["training_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, 0)
    float(metrics["training_loss"])
    dt = (time.perf_counter() - t0) / iters

    edges_per_event = int(hparams["n_edges_max"])
    return mesh_size * edges_per_event / dt, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sizes", default=None,
                   help="comma-separated mesh sizes (default: 1..device_count)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n = jax.device_count()
    sizes = ([int(s) for s in args.sizes.split(",")] if args.sizes
             else [s for s in (1, 2, 4, 8, 16, 32) if s <= n])

    overrides = {
        "n_nodes_max": 2048, "n_edges_max": 8192, "max_clusters": 512,
        "max_particles": 512, "latent": 64, "n_interaction_graph_iters": 2,
        "n_hierarchical_graph_iters": 2, "knn_block_size": 512,
        "train_split": [4, 2, 2],
    }
    results = []
    base = None
    for s in sizes:
        eps, dt = measure(s, overrides)
        if base is None:
            base = eps
        eff = eps / (base * s)
        results.append({"devices": s, "edges_per_s": round(eps),
                        "step_ms": round(dt * 1e3, 1),
                        "scaling_efficiency": round(eff, 4)})
        print(json.dumps(results[-1]), flush=True)
    # virtual CPU devices oversubscribe the same host cores, so CPU-mode
    # wall-clock (and hence efficiency) is meaningless -- the artifact it
    # produces proves the sharded program compiles and runs at every mesh
    # size, not how it scales.  Real efficiency needs one process per chip.
    mode = "cpu-correctness" if args.cpu else "device"
    print(json.dumps({"metric": "dp_scaling", "mode": mode,
                      "platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    main()
