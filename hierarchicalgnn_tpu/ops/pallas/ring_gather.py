"""Bidirectional ring all-gather over ICI via Pallas async remote DMA.

The halo exchange of edge-partitioned graph parallelism (parallel/halo.py)
refreshes every device's copy of the row-sharded node features once per
message-passing iteration.  The XLA path uses ``lax.all_gather``; this
kernel is the hand-scheduled equivalent from the scaling playbook: each
device forwards blocks around the ring in BOTH directions at once (using
both ICI ports, so the exchange completes in ceil((P-1)/2) steps instead
of P-1), double-buffered so the copy-out of step s overlaps the RDMA of
step s+1.

This replaces what the reference delegates to single-GPU torch (it has no
multi-device path at all — reference ``README.md:65`` warns multi-GPU is
unstable); the design follows the ring-collective pattern of the TPU
kernel guide.  Validated against ``lax.all_gather`` on the virtual CPU
mesh through the Pallas TPU interpreter (tests/test_ring_gather.py).

Shape constraints in compiled mode: the per-device block [B, D] should be
tile-aligned (B multiple of 8, D multiple of 128 for f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(axis_name, axis_size, x_ref, out_ref,
                 buf_cw, buf_ccw, sem_cw, sem_ccw):
    """Per-device kernel body (runs under shard_map over ``axis_name``).

    buf_cw/buf_ccw: [2, B, D] double buffers for the two ring directions.
    sem_cw/sem_ccw: [2] send + [2] recv DMA semaphore pairs, stacked as
    [2, 2] (slot major: [slot][0]=send, [slot][1]=recv).
    """
    p = axis_size
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, p)
    left = jax.lax.rem(my_id - 1 + p, p)
    b = x_ref.shape[0]

    # Own block goes straight to the output.
    out_ref[pl.ds(my_id * b, b), :] = x_ref[:]

    n_cw = (p - 1 + 1) // 2          # blocks arriving from the left chain
    n_ccw = (p - 1) // 2             # blocks arriving from the right chain
    if n_cw == 0 and n_ccw == 0:
        return

    # Neighbors must not RDMA into our buffers before we are in the kernel.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    buf_cw[0] = x_ref[:]
    buf_ccw[0] = x_ref[:]

    def dma(direction_buf, sems, slot, nxt, dst):
        return pltpu.make_async_remote_copy(
            src_ref=direction_buf.at[slot],
            dst_ref=direction_buf.at[nxt],
            send_sem=sems.at[slot, 0],
            recv_sem=sems.at[nxt, 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    steps = max(n_cw, n_ccw)

    def start(s):
        """Kick off step s's transfers: both directions ride opposite ICI
        ports concurrently.  Step s sends slot s%2 (own block at s=0, the
        just-received block after) into the neighbor's slot (s+1)%2."""
        slot, nxt = s % 2, (s + 1) % 2
        r_cw = dma(buf_cw, sem_cw, slot, nxt, right) if s < n_cw else None
        r_ccw = dma(buf_ccw, sem_ccw, slot, nxt, left) if s < n_ccw else None
        if r_cw is not None:
            r_cw.start()
        if r_ccw is not None:
            r_ccw.start()
        return r_cw, r_ccw

    inflight = start(0)
    for s in range(steps):
        nxt = (s + 1) % 2
        rdma_cw, rdma_ccw = inflight
        if rdma_cw is not None:
            rdma_cw.wait()
        if rdma_ccw is not None:
            rdma_ccw.wait()
        # Forward the just-received blocks onward BEFORE copying them out:
        # step s+1's wire time hides behind step s's VMEM->HBM copy-out.
        # (Step s+1 receives into the slot sent at step s, whose send is
        # already complete; the forward-send only *reads* the new slot.)
        if s + 1 < steps:
            inflight = start(s + 1)
        if rdma_cw is not None:
            src = jax.lax.rem(my_id - (s + 1) + p, p)
            out_ref[pl.ds(src * b, b), :] = buf_cw[nxt]
        if rdma_ccw is not None:
            src = jax.lax.rem(my_id + (s + 1), p)
            out_ref[pl.ds(src * b, b), :] = buf_ccw[nxt]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ring_all_gather(x, axis_name: str, axis_size: int,
                    interpret: bool = False, collective_id: int = 7):
    """Tiled all-gather of row blocks over a mesh axis, as a Pallas RDMA
    ring.  Drop-in for ``lax.all_gather(x, axis_name, axis=0, tiled=True)``
    inside ``shard_map``.

    Differentiable: the transpose of a tiled all-gather is a tiled
    reduce-scatter, so the backward pass is a ``lax.psum_scatter`` of the
    cotangent (matching ``all_gather``'s own VJP).

    x: [B, D] local block; returns [axis_size * B, D].
    """
    b, d = x.shape
    kernel = functools.partial(_ring_kernel, axis_name, axis_size)
    out_shape = jax.ShapeDtypeStruct((axis_size * b, d), x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b, d), x.dtype),      # clockwise double buffer
            pltpu.VMEM((2, b, d), x.dtype),      # counter-clockwise
            pltpu.SemaphoreType.DMA((2, 2)),     # cw [slot][send/recv]
            pltpu.SemaphoreType.DMA((2, 2)),     # ccw
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x)


def _ring_fwd(x, axis_name, axis_size, interpret, collective_id):
    return ring_all_gather(x, axis_name, axis_size, interpret,
                           collective_id), None


def _ring_bwd(axis_name, axis_size, interpret, collective_id, _, g):
    return (jax.lax.psum_scatter(g, axis_name, scatter_dimension=0,
                                 tiled=True),)


ring_all_gather.defvjp(_ring_fwd, _ring_bwd)
