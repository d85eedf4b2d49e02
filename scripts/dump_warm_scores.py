"""Dump the warm-state bipartite pair-score matrix for auction diagnosis.

Runs K warmup training steps of the flagship BC config (same build as
scripts/profile_phases.py), computes the [P, C] accumulated pair scores
the matching sees, and saves them to /tmp/warm_matching.npz.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

from profile_bc_step import BASE_OVERRIDES, build  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--warmup", type=int, default=40)
    ap.add_argument("--out", default="/tmp/warm_matching.npz")
    args = ap.parse_args()

    model, pipeline, optimizer, params, buffers, opt_state, batch = build(
        {"remat": False}, args.dtype, n_particles=3000)

    def train_k(params, buffers, opt_state, k):
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

    wp, wb, _ = jax.jit(train_k, static_argnums=3)(
        params, buffers, opt_state, args.warmup)
    variables = {"params": wp, **wb}
    (bgraph_w, scores, intermediate, aux), _ = model.apply(
        variables, batch.x, batch.graph, node_mask=batch.node_mask,
        training=True, mutable=list(wb))

    from hierarchicalgnn_tpu.ops.segment import segment_sum
    hp = dict(BASE_OVERRIDES)
    p_max = batch.particle_pid.shape[0]
    c_max = hp["max_clusters"]
    part_of_edge = batch.pid_compact[bgraph_w.senders]
    flat = part_of_edge * c_max + bgraph_w.receivers
    pair_scores = segment_sum(
        jnp.where(bgraph_w.edge_mask, jax.lax.stop_gradient(scores), 0.0),
        flat, p_max * c_max).reshape(p_max, c_max)
    np.savez(args.out, pair_scores=np.asarray(pair_scores),
             n_particles=int(batch.n_particles),
             n_clusters=int(aux["n_clusters"]))
    print("saved", args.out, "P=", int(batch.n_particles),
          "C=", int(aux["n_clusters"]))


if __name__ == "__main__":
    main()
