"""Single-chip scaling anchor: flagship BC train-step throughput on TPU.

Fills the ``tpu_single_chip`` section of ``benchmarks/scaling_r0X.json``
(round-2 verdict item 5): the 1-chip denominator of the BASELINE.json
">=80% edges/s scaling efficiency" north star.  Measures, on the real
chip, at the SHIPPED BC operating point (Pallas sorted-native kernels +
bf16 data path, configs/bc_hgnn_gmm.yaml):

  * the unsharded jitted train step (the single-chip production path), and
  * the graph-partitioned shard_map step on a {graph: 1} mesh (the
    multi-chip program at its 1-chip point -- partition overhead visible
    as the delta to the unsharded step).

Timing: K steps inside ONE jit (lax.fori_loop over the donated-state
carry, batch as an argument) + a scalar readback -- under the axon tunnel
``block_until_ready`` does not block and each dispatch costs ~30 ms RPC,
so per-call host timing would swamp a ~60 ms step.

Usage (single-tenant chip -- never concurrently with another TPU job):
    python scripts/measure_single_chip.py [--steps 32] [--out benchmarks/scaling_r03.json]
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


def _status(msg):
    print(f"[anchor] {msg}", file=sys.stderr, flush=True)


def _timed_steps(step_fn, state, batch, k):
    """Seconds per step: k steps in one jit, minus a 1-step calibration."""

    @jax.jit
    def many(state, batch, n):
        def body(i, s):
            s2, metrics = step_fn(s, batch, 0)
            return s2
        s = jax.lax.fori_loop(0, n, body, state)
        return s, jnp.asarray(0.0)

    def run(n):
        s, z = many(state, batch, n)
        float(z)
        # force full completion: read one param leaf scalar
        leaf = jax.tree.leaves(s.params)[0]
        float(jnp.sum(leaf))
        return s

    _status("compiling timed-loop program")
    run(1)
    _status("compiled; timing")
    t0 = time.perf_counter()
    run(k)
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(1)
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (k - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--particles", type=int, default=200)
    ap.add_argument("--flagship", action="store_true",
                    help="pad to the flagship regime (24k nodes / 49k "
                         "edges / 3072 clusters, the shape the collective "
                         "audit and roofline use); pair with "
                         "--particles 3000")
    args = ap.parse_args()

    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.parallel.graph_shard import make_sharded_train_step
    from hierarchicalgnn_tpu.parallel.mesh import make_mesh
    from hierarchicalgnn_tpu.parallel.step import stack_events
    from hierarchicalgnn_tpu.train.optim import make_optimizer
    from hierarchicalgnn_tpu.train.pipelines import MUTABLE  # noqa: F401
    from hierarchicalgnn_tpu.train.trainer import Trainer

    # the SHIPPED config: configs/bc_hgnn_gmm.yaml defaults (Pallas + bf16)
    ov = ({"n_nodes_max": 24576, "n_edges_max": 49152,
           "max_clusters": 3072, "max_particles": 4096,
           "train_split": [1, 1, 1]} if args.flagship else {})
    hparams, model, pipeline = model_selector("BC-HGNN-GMM", ov)
    raw = generate_event(np.random.default_rng(0),
                         n_particles=args.particles)
    ev = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    n_real_edges = int(np.asarray(ev.graph.edge_mask).sum())
    e_cap = int(ev.graph.capacity)

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/anchor")
    state0 = trainer.init_state(ev)
    optimizer = trainer.optimizer

    # --- unsharded production step -------------------------------------
    def plain_step(state, batch, epoch):
        def loss_fn(params):
            loss, (nb, m) = pipeline.loss(params, state.buffers, batch,
                                          epoch, training=True)
            return loss, (nb, m)

        (loss, (nb, m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(params=new_params, buffers=nb,
                             opt_state=new_opt, step=state.step + 1), m

    _status("measuring unsharded step")
    dt_plain = _timed_steps(plain_step, state0, ev, args.steps)

    # --- sharded step at its 1-chip point ------------------------------
    _status("measuring sharded step (mesh graph=1)")
    mesh = make_mesh(data=1, graph=jax.device_count())
    sharded = make_sharded_train_step(pipeline, optimizer, mesh, hparams)
    batch = stack_events([ev])
    # the sharded step donates its state arg -- feed it a copy so state0
    # survives for the timed loop below
    s1, m1 = sharded(jax.tree.map(jnp.array, state0), batch, 0)
    loss1 = float(m1["training_loss"])
    assert np.isfinite(loss1), loss1

    def sharded_inner(state, b, epoch):
        return sharded(state, b, epoch)

    dt_shard = _timed_steps(sharded_inner, state0, batch, args.steps)

    result = {
        "config": ("configs/bc_hgnn_gmm.yaml defaults (Pallas + bf16)"
                   + (", FLAGSHIP shape" if args.flagship else "")),
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "padded_edges": e_cap,
        "real_edges": n_real_edges,
        "unsharded": {
            "step_ms": round(dt_plain * 1e3, 2),
            "edges_per_s_padded": round(e_cap / dt_plain),
            "edges_per_s_real": round(n_real_edges / dt_plain),
        },
        "sharded_graph1": {
            "step_ms": round(dt_shard * 1e3, 2),
            "edges_per_s_padded": round(e_cap / dt_shard),
            "edges_per_s_real": round(n_real_edges / dt_shard),
            "loss_finite": True,
            "loss": round(loss1, 5),
        },
        "partition_overhead_pct": round(
            (dt_shard / dt_plain - 1.0) * 100, 1),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out) \
            if not os.path.isabs(args.out) else args.out
        try:
            with open(path) as f:
                doc = json.load(f)
        except FileNotFoundError:
            doc = {"metric": "dp_scaling"}
        doc["tpu_single_chip"] = result
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        _status(f"wrote {path}")


if __name__ == "__main__":
    main()
