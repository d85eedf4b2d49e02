"""Flagship-shape single-chip anchor + phase breakdown of the SHARDED step.

Round-3 verdict item 1: the graph partition cost 80.3% at its own 1-chip
point, measured only at a 200-particle toy event -- no flagship-shape
sharded measurement existed, and no phase breakdown of where the sharded
step's overhead goes.  This script measures, on the real chip, at the
FLAGSHIP regime (24k nodes / 49k directed-edge capacity, latent 256, 6+6
iterations, the shipped Pallas+bf16 config):

  * the unsharded production train step (the 1-chip denominator),
  * the graph-partitioned shard_map step on a {graph: 1} mesh,
  * a phase ladder of the sharded program:
      - partition machinery alone (partition_edges + per-shard plan builds)
      - sharded forward only
      - unsharded forward only (the delta isolates forward-side partition
        overhead from loss/backward-side overhead)

Writes the ``tpu_single_chip`` section of benchmarks/scaling_r0N.json.
Reference scope being partitioned: the hot loops of
``/root/reference/Modules/gnn_utils.py:17-169``.

Usage (single-tenant chip -- never concurrently with another TPU job):
    python scripts/profile_sharded.py [--steps 16] [--particles 3000] \
        [--out benchmarks/scaling_r04.json]
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

FLAGSHIP = {
    "n_nodes_max": 24576,
    "n_edges_max": 49152,
    "max_clusters": 3072,
    "max_particles": 4096,
    "train_split": [1, 1, 1],
}


def _status(msg):
    print(f"[sharded-profile] {msg}", file=sys.stderr, flush=True)


def _timed_carry(step_fn, carry0, k):
    """Seconds/step of carry -> carry inside ONE jit (axon timing rules)."""

    @jax.jit
    def many(carry, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), carry)

    def run(n):
        out = many(carry0, n)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf))

    run(1)
    t0 = time.perf_counter(); run(k); t_many = time.perf_counter() - t0
    t0 = time.perf_counter(); run(1); t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (k - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--particles", type=int, default=3000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.ops.graph import bidirectionalize
    from hierarchicalgnn_tpu.parallel.graph_shard import (
        SpmdSpec, make_shard_tools, make_sharded_forward,
        make_sharded_train_step)
    from hierarchicalgnn_tpu.parallel.mesh import make_mesh
    from hierarchicalgnn_tpu.parallel.step import stack_events
    from hierarchicalgnn_tpu.train.trainer import Trainer
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    _status("warmup readback")
    float(jnp.zeros(()).sum())

    hparams, model, pipeline = model_selector("BC-HGNN-GMM", FLAGSHIP)
    raw = generate_event(np.random.default_rng(0),
                         n_particles=args.particles)
    ev = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    n_real = int(np.asarray(ev.graph.edge_mask).sum())
    e_cap = int(ev.graph.capacity)
    _status(f"event: {e_cap} padded edges, {n_real} real; "
            f"nodes {ev.x.shape[0]}")

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/shprof")
    state0 = trainer.init_state(ev)
    optimizer = trainer.optimizer
    mesh = make_mesh(data=1, graph=jax.device_count())
    n_parts = jax.device_count()

    results = {}

    # --- unsharded train step -------------------------------------------
    def plain_step(carry):
        state, = carry

        def loss_fn(p):
            loss, (nb, m) = pipeline.loss(p, state.buffers, ev, 0,
                                          training=True)
            return loss, (nb, m)

        (_, (nb, m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (state.replace(params=new_params, buffers=nb,
                              opt_state=new_opt, step=state.step + 1),)

    _status("timing unsharded train step")
    dt_plain = _timed_carry(plain_step, (state0,), args.steps)
    results["unsharded_step_ms"] = round(dt_plain * 1e3, 2)
    _status(f"unsharded: {dt_plain * 1e3:.1f} ms")

    # --- sharded train step ---------------------------------------------
    sharded = make_sharded_train_step(pipeline, optimizer, mesh, hparams)
    batch = stack_events([ev])

    def sharded_step(carry):
        state, = carry
        new_state, _ = sharded(state, batch, 0)
        return (new_state,)

    _status("timing sharded train step (mesh graph=%d)" % n_parts)
    dt_shard = _timed_carry(sharded_step, (state0,), args.steps)
    results["sharded_step_ms"] = round(dt_shard * 1e3, 2)
    _status(f"sharded: {dt_shard * 1e3:.1f} ms")

    # --- phase ladder ----------------------------------------------------
    # 1. partition machinery alone (inside shard_map, like the real step)
    spec = SpmdSpec(axis="graph", n_parts=n_parts,
                    slack=float(hparams.get("halo_slack", 1.5)),
                    use_pallas=bool(hparams.get("use_pallas", False)))
    n_local = ev.x.shape[0] // n_parts

    def partition_only(x, graph):
        directed = bidirectionalize(graph)
        tools = make_shard_tools(directed, n_local, spec)
        # consume the partition outputs so nothing is DCE'd
        return (jnp.sum(tools.local_graph.receivers)
                + jnp.sum(tools.slot) + tools.ok.astype(jnp.int32))

    part_fn = jax.jit(shard_map(
        partition_only, mesh=mesh, in_specs=(P("graph"), P()),
        out_specs=P(), check_vma=False))

    def part_step(carry):
        acc, = carry
        return (acc + part_fn(ev.x, ev.graph),)

    _status("timing partition machinery")
    dt_part = _timed_carry(part_step, (jnp.zeros((), jnp.int32),),
                           args.steps)
    results["partition_machinery_ms"] = round(dt_part * 1e3, 2)
    _status(f"partition machinery: {dt_part * 1e3:.1f} ms")

    # 2-4. forward / loss / grad(loss) rungs, sharded vs unsharded.
    # Every rung's input x is scaled by a carry-dependent factor so the
    # computation cannot be hoisted out of the timing loop (a stateless
    # body IS hoisted: grad rungs first measured equal to loss rungs).
    from hierarchicalgnn_tpu.train.pipelines import MUTABLE
    from hierarchicalgnn_tpu.parallel.graph_shard import _model_out_specs

    def sh_body(params, buffers, x, node_mask, graph):
        out, new_vars = model.apply(
            {"params": params, **buffers}, x, graph, node_mask=node_mask,
            training=True, mutable=MUTABLE, spmd=spec)
        return out, dict(new_vars)

    sh_fwd = shard_map(
        sh_body, mesh=mesh,
        in_specs=(P(), P(), P("graph"), P("graph"), P()),
        out_specs=(_model_out_specs(hparams["model"], "graph"), P()),
        check_vma=False)

    def sh_loss(params, x):
        out, _ = sh_fwd(params, state0.buffers, x, ev.node_mask, ev.graph)
        loss, _ = pipeline.loss_from_outputs(out, ev, 0)
        return loss

    def un_loss(params, x):
        loss, _ = pipeline.loss(params, state0.buffers,
                                ev._replace(x=x), 0, training=True)
        return loss

    def sh_forward(params, x):
        out, _ = sh_fwd(params, state0.buffers, x, ev.node_mask, ev.graph)
        return jnp.sum(out[1])

    def un_forward(params, x):
        variables = {"params": params, **state0.buffers}
        out = model.apply(variables, x, ev.graph,
                          node_mask=ev.node_mask, training=False)
        return jnp.sum(out[1])

    rungs = (
        ("sharded_forward", sh_forward),
        ("unsharded_forward", un_forward),
        ("sharded_loss", sh_loss),
        ("unsharded_loss", un_loss),
        # consume EVERY grad leaf: reading one leaf lets XLA dead-code
        # -eliminate the rest of the backward (measured grad==loss).
        ("sharded_gradloss",
         lambda p, x: sum(jnp.sum(l) for l in
                          jax.tree.leaves(jax.grad(sh_loss)(p, x)))),
        ("unsharded_gradloss",
         lambda p, x: sum(jnp.sum(l) for l in
                          jax.tree.leaves(jax.grad(un_loss)(p, x)))),
    )
    for label, fn in rungs:
        def rung(carry, fn=fn):
            acc, = carry
            x = ev.x * (1.0 + acc * 1e-20)  # carry-dependent: no hoisting
            return (acc + fn(state0.params, x).astype(jnp.float32),)

        _status(f"timing {label}")
        dt = _timed_carry(rung, (jnp.zeros(()),), args.steps)
        results[f"{label}_ms"] = round(dt * 1e3, 2)
        _status(f"{label}: {dt * 1e3:.1f} ms")
    dt_fwd_s = results["sharded_forward_ms"] / 1e3
    dt_fwd_p = results["unsharded_forward_ms"] / 1e3

    overhead = (dt_shard / dt_plain - 1.0) * 100
    result = {
        "config": "configs/bc_hgnn_gmm.yaml defaults (Pallas + bf16), "
                  "FLAGSHIP shape",
        "platform": jax.devices()[0].platform,
        "n_devices": n_parts,
        "padded_edges": e_cap,
        "real_edges": n_real,
        "n_nodes": int(ev.x.shape[0]),
        "latent": hparams["latent"],
        "iters": f"{hparams['n_interaction_graph_iters']}+"
                 f"{hparams['n_hierarchical_graph_iters']}",
        "unsharded": {"step_ms": results["unsharded_step_ms"],
                      "edges_per_s_padded": round(2 * e_cap / dt_plain)},
        "sharded_graph%d" % n_parts: {
            "step_ms": results["sharded_step_ms"],
            "edges_per_s_padded": round(2 * e_cap / dt_shard)},
        "partition_overhead_pct": round(overhead, 1),
        "phase_breakdown_ms": {
            "partition_machinery": results["partition_machinery_ms"],
            "sharded_forward": results["sharded_forward_ms"],
            "unsharded_forward": results["unsharded_forward_ms"],
            "sharded_loss": results.get("sharded_loss_ms"),
            "unsharded_loss": results.get("unsharded_loss_ms"),
            "sharded_gradloss": results.get("sharded_gradloss_ms"),
            "unsharded_gradloss": results.get("unsharded_gradloss_ms"),
            "sharded_loss_backward_optim": round(
                (dt_shard - dt_fwd_s) * 1e3, 2),
            "unsharded_loss_backward_optim": round(
                (dt_plain - dt_fwd_p) * 1e3, 2),
        },
    }
    print(json.dumps(result, indent=2))
    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            args.out)
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
