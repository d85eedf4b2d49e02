"""Tensor parallelism over the ``hidden`` dimension via pjit sharding rules.

The reference has no tensor parallelism (single GPU, reference
``Notebooks/script.py:35``); survey §2.4 notes TP over the MLP ``latent``/
``hidden`` width is the one TP axis that makes sense for this model family
when the MLPs get wide.  TPU-native design: no hand-written collectives —
parameters and optimizer state are laid out with ``NamedSharding`` rules
and XLA's SPMD partitioner inserts the all-gathers/psums implied by the
sharded matmuls.

Sharding rule (shape-based, applies uniformly to params AND optimizer
moments, which mirror param shapes):

  * Dense kernels ``[in, hidden]``  -> ``P(None, "model")``  (column split)
  * Dense kernels ``[hidden, out]`` -> ``P("model", None)``  (row split;
    column wins when both dims are ``hidden``)
  * 1-D ``(hidden,)`` vectors (biases, LayerNorm scale/bias) -> ``P("model")``
  * everything else replicated.

Each MLP hidden layer thus becomes a Megatron-style column/row pair around
the ``hidden`` bottleneck; the LayerNorms between layers reduce over the
sharded feature dim, which XLA resolves with a small psum.  Combines with
event data parallelism on an ``("data", "model")`` mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hierarchicalgnn_tpu.train.trainer import TrainState


def make_tp_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def _leaf_spec(shape, hidden: int, axis: str = "model") -> P:
    if len(shape) == 2:
        if shape[1] == hidden:
            return P(None, axis)       # column split
        if shape[0] == hidden:
            return P(axis, None)       # row split
    elif len(shape) == 1 and shape[0] == hidden:
        return P(axis)
    return P()


def tp_shardings(tree, mesh: Mesh, hidden: int):
    """NamedSharding pytree for any param/opt-state pytree by shape rule."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _leaf_spec(jnp.shape(x), hidden)),
        tree)


def shard_state(state: TrainState, mesh: Mesh, hidden: int):
    """Lay out a TrainState across the mesh per the TP rules.

    Buffers (EMA statistics, batch-norm running stats) stay replicated —
    they are tiny and consumed by every shard.
    """
    sharding = state_shardings(state, mesh, hidden)
    return jax.device_put(state, sharding), sharding


def state_shardings(state: TrainState, mesh: Mesh, hidden: int):
    rep = NamedSharding(mesh, P())
    return TrainState(
        params=tp_shardings(state.params, mesh, hidden),
        buffers=jax.tree.map(lambda _: rep, state.buffers),
        opt_state=tp_shardings(state.opt_state, mesh, hidden),
        step=rep,
    )


def batch_shardings(batch, mesh: Mesh):
    """Event batch sharded over the data axis only (leading batch dim)."""
    data = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda _: data, batch)


def make_tp_train_step(pipeline, optimizer, mesh: Mesh, state: TrainState,
                       hidden: int):
    """Returns (sharded_state, jitted (state, batch, epoch) -> (state, metrics)).

    The step body is identical to the DP step (``parallel/step.py``); only
    the layouts differ — XLA SPMD derives the TP collectives from the param
    shardings and the gradient psum from the data sharding.
    """

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

    sharded_state, state_sharding = shard_state(state, mesh, hidden)
    rep = NamedSharding(mesh, P())
    # Batch rides the data axis (leading/event dim) so the data mesh axis
    # actually splits work; callers may pass an unsharded batch and jit
    # will lay it out.
    batch_sharding = NamedSharding(mesh, P("data"))
    step = jax.jit(
        train_step,
        in_shardings=(state_sharding, batch_sharding, None),
        out_shardings=(state_sharding, rep),
        donate_argnums=(0,),
    )
    return sharded_state, step
