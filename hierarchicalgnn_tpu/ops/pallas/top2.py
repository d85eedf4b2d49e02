"""Pallas row-wise top-2 (value, argmax, runner-up) of ``a - prices``.

The auction matching round (train/auction.py) needs, per particle row,
the best and second-best net value ``a[i, j] - prices[j]`` and the best
column index.  XLA computes this in 2-3 passes over the [P, C] matrix
(max+argmax, then a masked re-max for the runner-up) -- at the flagship
matching shape (3072 x 3072 f32, ~38 MB) that's the whole cost of a
bidding round, paid every round of the while_loop.  This kernel streams
the matrix once: each (row-block, col-block) grid step reduces its tile
on the VPU and folds the per-block (m1, am, m2) into VMEM-resident
running registers.

Tie semantics match XLA: argmax returns the lowest tied column; the
runner-up is the max over ``j != argmax`` (equal to the max on ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e30

BLOCK_P = 256
BLOCK_C = 512


def _top2_kernel(a_ref, prices_ref, v1_ref, j1_ref, v2_ref, *, block_c):
    cblk = pl.program_id(1)

    @pl.when(cblk == 0)
    def _():
        v1_ref[:] = jnp.full_like(v1_ref, NEG)
        j1_ref[:] = jnp.zeros_like(j1_ref)
        v2_ref[:] = jnp.full_like(v2_ref, NEG)

    net = a_ref[:] - prices_ref[0:1, :]            # (BP, BC)
    bp, bc = net.shape
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (bp, bc), 1)
               + cblk * block_c)
    m1 = jnp.max(net, axis=1, keepdims=True)       # (BP, 1)
    # lowest tied column, as XLA argmax
    am = jnp.min(jnp.where(net == m1, col_ids, jnp.int32(2 ** 30)),
                 axis=1, keepdims=True)
    m2 = jnp.max(jnp.where(col_ids == am, NEG, net), axis=1, keepdims=True)

    rv1, rj1, rv2 = v1_ref[:], j1_ref[:], v2_ref[:]
    better = m1 > rv1
    v1_ref[:] = jnp.where(better, m1, rv1)
    j1_ref[:] = jnp.where(better, am, rj1)
    # top-2 of the union: if the block wins, old best becomes a runner-up
    # candidate; otherwise the block's best does (ties keep the earlier
    # block's argmax and duplicate the value into v2, as XLA's masked
    # re-max does)
    v2_ref[:] = jnp.where(better, jnp.maximum(rv1, m2),
                          jnp.maximum(rv2, m1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_top2(a, prices, interpret=False):
    """Per-row (v1, j1, v2) of ``a - prices[None, :]`` in one HBM pass.

    a: [P, C] float32 (masked entries should hold a large negative);
    prices: [C] float32.  Returns (v1 [P] f32, j1 [P] int32, v2 [P] f32).
    """
    p, c = a.shape
    pad_p = (-p) % BLOCK_P
    pad_c = (-c) % BLOCK_C
    if pad_p or pad_c:
        a = jnp.pad(a, ((0, pad_p), (0, pad_c)), constant_values=NEG)
        prices = jnp.pad(prices, (0, pad_c))
    pp, cc = a.shape
    prices2 = prices.reshape(1, cc)

    grid = (pp // BLOCK_P, cc // BLOCK_C)
    v1, j1, v2 = pl.pallas_call(
        functools.partial(_top2_kernel, block_c=BLOCK_C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_P, BLOCK_C), lambda r, cb: (r, cb)),
            pl.BlockSpec((1, BLOCK_C), lambda r, cb: (0, cb)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_P, 1), lambda r, cb: (r, 0)),
            pl.BlockSpec((BLOCK_P, 1), lambda r, cb: (r, 0)),
            pl.BlockSpec((BLOCK_P, 1), lambda r, cb: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((pp, 1), jnp.int32),
            jax.ShapeDtypeStruct((pp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(a, prices2)
    return v1[:p, 0], j1[:p, 0], v2[:p, 0]
