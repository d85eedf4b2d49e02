"""Pallas RDMA ring all-gather vs lax.all_gather on the virtual CPU mesh.

The kernel (ops/pallas/ring_gather.py) is the hand-scheduled halo
collective for edge-partitioned graph parallelism; the Pallas TPU
interpreter simulates the inter-device DMAs and semaphores on CPU, so the
ring schedule (both directions, double buffering, forwarding order) is
validated without a pod.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hierarchicalgnn_tpu.ops.pallas.ring_gather import ring_all_gather


def _run_ring(n_dev, b=8, d=128, dtype=jnp.float32):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    x = jnp.arange(n_dev * b * d, dtype=dtype).reshape(n_dev * b, d)

    def per_device(x_local):
        return ring_all_gather(x_local, "graph", n_dev, interpret=True)

    f = shard_map(per_device, mesh=mesh, in_specs=P("graph"),
                  out_specs=P("graph"), check_vma=False)
    got = jax.jit(f)(x)
    # each device's gathered copy equals the full array; out_specs=P stacks
    # the per-device [n*b, d] results into [n*n*b, d]
    got = np.asarray(got).reshape(n_dev, n_dev * b, d)
    want = np.asarray(x)
    for dev in range(n_dev):
        np.testing.assert_array_equal(got[dev], want)


@pytest.mark.parametrize("n_dev", [2, 3, 4, 8])
def test_ring_all_gather_matches_all_gather(n_dev):
    _run_ring(n_dev)


def test_ring_all_gather_random_values():
    rng = np.random.default_rng(0)
    n_dev, b, d = 4, 16, 128
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    x = jnp.asarray(rng.normal(size=(n_dev * b, d)).astype(np.float32))

    def pallas_gather(x_local):
        return ring_all_gather(x_local, "graph", n_dev, interpret=True)

    def xla_gather(x_local):
        return jax.lax.all_gather(x_local, "graph", axis=0, tiled=True)

    run = lambda fn: np.asarray(jax.jit(shard_map(
        fn, mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
        check_vma=False))(x))
    np.testing.assert_array_equal(run(pallas_gather), run(xla_gather))
