"""Sharded training steps: event data parallelism over a device mesh.

Builds a jitted multi-event training step where the event batch is sharded
over the mesh ``data`` axis and each event's edge arrays additionally over
the ``graph`` axis.  Parameters and optimizer state are replicated; XLA's
SPMD partitioner inserts the gradient psum and the node-space collectives
implied by edge-sharded segment reductions -- no hand-written NCCL-style
communication (survey §2.4).

EMA/batch-norm buffers are averaged across the event batch, the standard
DP treatment of running statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.parallel.mesh import batch_sharding, replicated
from hierarchicalgnn_tpu.train.trainer import TrainState


def stack_events(events):
    """Stack a list of Event pytrees into a batched Event [B, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *events)


def make_dp_train_step(pipeline, optimizer, mesh):
    """Returns a jitted (state, batched_event, epoch) -> (state, metrics)."""

    def batched_loss(params, buffers, batch, epoch):
        def one(ev):
            loss, (new_buffers, metrics) = pipeline.loss(
                params, buffers, ev, epoch, training=True)
            return loss, new_buffers, metrics

        losses, bufs, mets = jax.vmap(one)(batch)
        new_buffers = jax.tree.map(lambda b: jnp.mean(b, axis=0), bufs)
        metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), mets)
        return jnp.mean(losses), (new_buffers, metrics)

    def train_step(state: TrainState, batch, epoch):
        (loss, (new_buffers, metrics)), grads = jax.value_and_grad(
            batched_loss, has_aux=True)(state.params, state.buffers,
                                        batch, epoch)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, buffers=new_buffers,
                               opt_state=new_opt_state, step=state.step + 1)
        return new_state, metrics

    rep = replicated(mesh)
    state_sharding = TrainState(params=rep, buffers=rep, opt_state=rep,
                                step=rep)
    return jax.jit(
        train_step,
        in_shardings=(state_sharding, batch_sharding(mesh), None),
        out_shardings=(state_sharding, rep),
        donate_argnums=(0,),
    )
