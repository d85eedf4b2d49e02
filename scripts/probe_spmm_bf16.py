"""Probe the bf16 fused-weight aggregation's compute bound (VERDICT r3 #8).

The bf16 sorted-native weighted segment sum runs ~661-675M edges/s -- only
~1.25x the f32 path -- because the per-chunk one-hot build (VPU) and the
one-hot MXU matmul cost the same regardless of data dtype.  This probe
measures, on the real chip at the bench shape (E=512k, D=256):

  shipped        the production kernel (baseline)
  be2048         block_e=2048 (amortize per-chunk setup further)
  int16cmp       one-hot compare/select in int16/bf16 packed lanes
                 (2 ops/cycle on 16-bit lanes if Mosaic packs them)
  prebuilt       the SAME matmul with a constant one-hot from VMEM scratch
                 (wrong results; isolates the MXU+DMA cost with the build
                 removed -- the floor if the build were free)
  buildonly      one-hot build + trivial VPU reduce, no matmul
                 (isolates the build cost)

shipped ~= prebuilt + buildonly  ==> the bound is the serialized
VPU-build -> MXU chain, i.e. architectural for this formulation.

Usage: python scripts/probe_spmm_bf16.py [--iters 64]
"""

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_NODES = 65536
N_EDGES = 524288
DIM = 256


def _status(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


# --- experimental kernel bodies (probe-local variants of
# ops/pallas/sorted_agg.py::_sorted_weighted_kernel) --------------------

def _kernel_int16(cb_ref, nch_ref, seg_ref, w_ref, data_ref, out_ref, *,
                  block_r):
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        # subtract + clamp on the cheap (1, BE) slice, then compare in
        # int16 so the [BR, BE] broadcast-compare can pack 2 lanes/cycle
        seg = seg_ref[0, 0:1, :] - g * block_r
        seg16 = jnp.clip(seg, -1, block_r).astype(jnp.int16)
        w = w_ref[0, 0:1, :]
        block_e = seg16.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int16, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg16, (block_r, block_e)) == rows
        wmat = jnp.where(onehot, jnp.broadcast_to(w, (block_r, block_e)),
                         0.0).astype(data_ref.dtype)
        out_ref[:] += jax.lax.dot_general(
            wmat, data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _kernel_prebuilt(cb_ref, nch_ref, seg_ref, w_ref, data_ref, out_ref,
                     scratch, *, block_r):
    """Constant one-hot from scratch: isolates MXU+DMA cost (WRONG maths)."""
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when((g == 0) & (c == 0))
    def _():
        block_e = scratch.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 1)
        scratch[:] = (rows == (cols % block_r)).astype(scratch.dtype)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        out_ref[:] += jax.lax.dot_general(
            scratch[:], data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _kernel_buildonly(cb_ref, nch_ref, seg_ref, w_ref, data_ref, out_ref, *,
                      block_r):
    """One-hot build + cheap reduce, no matmul: isolates the VPU build."""
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r
        w = w_ref[0, 0:1, :]
        block_e = seg.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg, (block_r, block_e)) == rows
        wmat = jnp.where(onehot, jnp.broadcast_to(w, (block_r, block_e)),
                         0.0).astype(data_ref.dtype)
        # touch every wmat element without an MXU pass
        out_ref[:] += jnp.sum(wmat, axis=1, keepdims=True).astype(
            out_ref.dtype) + data_ref[0:out_ref.shape[0], 0:1] * 0.0


def _kernel_pipelined(cb_ref, nch_ref, seg_ref, w_ref, data_ref, out_ref,
                      wmat, *, block_r):
    """Software-pipelined fused-weight aggregation: step (g, c) builds the
    weighted one-hot for chunk c on the VPU while the MXU multiplies chunk
    c-1's one-hot (double-buffered scratch).  The two halves touch
    different scratch slots and different input blocks, so Mosaic can
    overlap them -- the shipped kernel serializes build -> matmul inside
    each step.  Grid is (n_groups, c_max + 1): one drain step per group."""
    g = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < nch_ref[g])
    def _():
        seg = seg_ref[0, 0:1, :] - g * block_r
        w = w_ref[0, 0:1, :]
        block_e = seg.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_e), 0)
        onehot = jnp.broadcast_to(seg, (block_r, block_e)) == rows
        wmat[c % 2] = jnp.where(
            onehot, jnp.broadcast_to(w, (block_r, block_e)),
            0.0).astype(wmat.dtype)

    @pl.when((c > 0) & (c - 1 < nch_ref[g]))
    def _():
        out_ref[:] += jax.lax.dot_general(
            wmat[(c - 1) % 2], data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _run_pipelined(plan, data, w_rep, block_r, block_e, c_max,
                   interpret=False):
    e_pad, d = data.shape
    n_groups = -(-plan.num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e

    def bidx(g, c, cb, nch):       # chunk c's block (build side)
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    def bidx_prev(g, c, cb, nch):  # chunk c-1's block (matmul side)
        cp = jnp.maximum(c - 1, 0)
        return jnp.minimum(cb[g] + jnp.minimum(cp, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max + 1),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (bidx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (bidx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((block_e, d),
                         lambda g, c, cb, nch: (bidx_prev(g, c, cb, nch), 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda g, c, cb, nch: (g, 0)),
        scratch_shapes=[pltpu.VMEM((2, block_r, block_e), data.dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_pipelined, block_r=block_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.float32),
        interpret=interpret,
    )(plan.chunk_base, plan.n_chunks, plan.seg_rep, w_rep, data)
    return out[:plan.num_segments]


def _run_variant(kernel_body, plan, data, w_rep, block_r, block_e, c_max,
                 out_cols, scratch=False):
    e_pad, d = data.shape
    n_groups = -(-plan.num_segments // block_r)
    n_rows = n_groups * block_r
    n_blocks = e_pad // block_e

    def block_idx(g, c, cb, nch):
        return jnp.minimum(cb[g] + jnp.minimum(c, nch[g] - 1), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups, c_max),
        in_specs=[
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((1, 8, block_e),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0, 0)),
            pl.BlockSpec((block_e, d),
                         lambda g, c, cb, nch: (block_idx(g, c, cb, nch), 0)),
        ],
        out_specs=pl.BlockSpec((block_r, out_cols),
                               lambda g, c, cb, nch: (g, 0)),
        scratch_shapes=([pltpu.VMEM((block_r, block_e), data.dtype)]
                        if scratch else []),
    )
    return pl.pallas_call(
        functools.partial(kernel_body, block_r=block_r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, out_cols), jnp.float32),
    )(plan.chunk_base, plan.n_chunks, plan.seg_rep, w_rep, data)


def _time_op(f, label, *args, iters):
    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            return acc + f(i, *a)
        return jax.lax.fori_loop(0, n, body, 0.0)

    _status(f"compiling {label}")
    float(loop(1, *args))
    t0 = time.perf_counter(); float(loop(iters, *args))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(1, *args))
    t_one = time.perf_counter() - t0
    dt = max((t_many - t_one) / (iters - 1), 1e-9)
    _status(f"{label}: {dt * 1e3:.3f} ms = {N_EDGES / dt / 1e6:.0f}M edges/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, sorted_aggregate_weighted)

    _status("warmup readback")
    float(jnp.zeros(()).sum())

    @functools.partial(jax.jit, static_argnames=("block_e",))
    def prep(key, block_e):
        ks, kr, kd, kw = jax.random.split(key, 4)
        receivers = jnp.sort(jax.random.randint(
            kr, (N_EDGES,), 0, N_NODES, jnp.int32))
        senders = jax.random.randint(ks, (N_EDGES,), 0, N_NODES, jnp.int32)
        mask = jnp.ones((N_EDGES,), bool)
        d = jax.random.normal(kd, (N_EDGES, DIM), jnp.float32)
        w = jax.random.normal(kw, (N_EDGES,), jnp.float32)
        plan = build_sorted_plan(senders, receivers, mask, N_NODES,
                                 block_e=block_e)
        ds = plan.sort(d).astype(jnp.bfloat16)
        ws = plan.sort(w)
        n_blocks = ds.shape[0] // block_e
        w_rep = jnp.broadcast_to(
            jnp.where(plan.edge_mask_sorted, ws, 0.0)
            .reshape(n_blocks, 1, block_e), (n_blocks, 8, block_e))
        return plan, ds, ws.astype(jnp.bfloat16), w_rep

    results = {}
    only = args.only.split(",") if args.only else None

    def want(name):
        return only is None or name in only

    for block_e, tag in ((1024, ""), (2048, "_be2048"), (4096, "_be4096")):
        name = "shipped" + tag
        if not want(name):
            continue
        plan, ds, ws, w_rep = prep(jax.random.key(0), block_e)

        def op(i, d, w, p):
            w = w * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
            return sorted_aggregate_weighted(d, w, p, False)[0, 0]

        results[name] = _time_op(op, name, ds, ws, plan, iters=args.iters)

    plan, ds, ws, w_rep = prep(jax.random.key(0), 1024)

    def mk(body, out_cols, scratch=False):
        def op(i, d, wr, p):
            d = d * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
            out = _run_variant(body, p, d, wr, 256, 1024, p.c_max,
                               out_cols, scratch)
            return out[0, 0]
        return op

    if want("pipelined"):
        def pipe_op(i, d, wr, p):
            d = d * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
            return _run_pipelined(p, d, wr, 256, 1024, p.c_max)[0, 0]

        try:
            results["pipelined"] = _time_op(pipe_op, "pipelined", ds, w_rep,
                                            plan, iters=args.iters)
        except Exception as e:
            _status(f"pipelined failed: {str(e)[:200]}")
            results["pipelined"] = None

    # a crashing experimental variant must not lose the others (int16cmp
    # hits a Mosaic relayout bug on the int16 broadcast-compare:
    # "Invalid relayout ... vector<256x1024xi1>")
    for name, body, cols, scr in (("int16cmp", _kernel_int16, DIM, False),
                                  ("prebuilt", _kernel_prebuilt, DIM, True),
                                  ("buildonly", _kernel_buildonly, 1, False)):
        if not want(name):
            continue
        try:
            results[name] = _time_op(mk(body, cols, scratch=scr), name,
                                     ds, w_rep, plan, iters=args.iters)
        except Exception as e:
            _status(f"{name} failed: {str(e)[:200]}")
            results[name] = None

    print(json.dumps({k: ({"ms": round(v * 1e3, 3),
                           "edges_per_s": round(N_EDGES / v)}
                          if v else None)
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
