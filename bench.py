"""Benchmark: SpMM aggregation throughput (edges/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (driver-defined north star, BASELINE.json): edges/s/chip for
the *weighted* message-aggregation segment-sum at BC-HGNN-GMM workload shape
(latent 256, TrackML-scale edge counts).  Weighted graph convolution
``out[i] = sum_e w_e * data_e`` is the hierarchical cell's hot aggregation
(reference ``Modules/gnn_utils.py:124,142-143``); the framework fuses the
per-edge weight into the one-hot MXU matmul (ops/pallas/sorted_agg.py),
while the baseline — XLA scatter-add over a materialized ``data * w`` edge
tensor, the torch_scatter-equivalent formulation — pays a full extra HBM
pass.  ``vs_baseline`` is the speedup over that baseline on the same device
and dtype (f32; the reference repo publishes no numbers of its own — see
BASELINE.md).

Compile-budget design (round-3 fix for the r2 timeout; the axon
remote-compile service charges 40-170+ s per program and compile time grows
super-linearly with program size — a merged 3-branch lax.switch program
measured >9 min, worse than 3 separate programs):
  * ONE compiled program per timed op, with the fori_loop iteration count a
    *traced* scalar so the N-iter measurement and 1-iter calibration share
    the compile (r2 paid two compiles per op).
  * Input prep (plan build + sorts + casts) packed into one jitted program
    (r2 left it eager: ~20 tiny remote programs, ~1 min cold).
  * Ops compile in priority order (xla baseline -> fused f32 -> bf16 ->
    sddmm) with a wall-clock guard BEFORE each optional compile; the
    headline line always prints, late fields degrade to null instead of
    the whole metric being lost to a timeout.

Timing notes: under the axon TPU tunnel, ``block_until_ready`` returns
early and a bare dispatch costs ~30 ms RPC; so each measurement loops the
op inside a single jit (``fori_loop``), forces a scalar readback, and
subtracts a 1-iteration calibration run.  The per-iteration input scaling
depends on the loop index (a [E] scalar multiply, ~0.5% of the edge-data
traffic) so XLA cannot hoist the op out of the loop.
"""

import json
import time

import os
import sys

_T0 = time.perf_counter()
# The driver gives ~590 s; leave head-room for the final measurement loops.
GUARD_S = float(os.environ.get("BENCH_GUARD_S", "420"))

# Self-locating: survives the venv being rebuilt without the editable install.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# reuse compiled programs across runs (axon remote compiles are slow)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

N_NODES = 65536
N_EDGES = 524288
DIM = 256
ITERS = 64


def _status(msg):
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _elapsed():
    return time.perf_counter() - _T0


def _warmup_readback():
    """Absorb the axon tunnel's first-readback stall on a trivial program.

    Measured across every r3 run: the FIRST device->host scalar readback of
    a process stalls 200-540 s (service handshake / transfer-path init) no
    matter which program triggers it; all subsequent readbacks are fast.
    Paying it on a zero-work program up front keeps the stall out of every
    timed/compiled stage below.
    """
    _status("warmup readback (absorbs the tunnel's first-readback stall)")
    float(jnp.zeros(()).sum())
    _status("warmup done")


def _make_loop(op):
    """One jitted program: sum_{i<n} op(i, *args), n traced (no recompile
    for n=1).  Arrays MUST ride as arguments: a closed-over edge tensor
    becomes an HLO literal constant -- 512 MB of module payload that the
    remote compile service chews on for >10 min (measured; the r3 first
    attempt's timeout)."""

    @jax.jit
    def f(n, *args):
        def body(i, acc):
            return acc + op(i, *args)
        return jax.lax.fori_loop(0, n, body, 0.0)

    return f


def _time_op(op, label, *args, iters=ITERS):
    """Per-iteration seconds of op(i, *args) inside one compiled program."""
    f = _make_loop(op)
    _status(f"compiling {label}")
    float(f(1, *args))  # the one remote compile
    _status(f"{label} compiled; timing")
    t0 = time.perf_counter()
    float(f(iters, *args))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(1, *args))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def bench_spmm(seed=0):
    """Returns {f32, bf16, xla_f32} weighted-aggregation edges/s (bf16 may
    be None when the wall-clock guard trips).

    The headline value is the FRAMEWORK path (sorted-native fused kernel),
    not min(framework, baseline) -- a kernel regression must show up in the
    metric, not be masked by the fallback.
    """
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, sorted_aggregate_weighted,
    )

    interpret = jax.default_backend() != "tpu"

    # ALL inputs generated ON DEVICE in one compiled program: only the PRNG
    # key crosses the tunnel.  (The r3 first attempts built the [E, D] edge
    # tensor with numpy -- a 512 MB host->device transfer whose cost lands
    # on the first scalar readback, 200-500 s of tunnel variance.)
    @jax.jit
    def prep(key):
        ks, kr, kd, kw = jax.random.split(key, 4)
        receivers = jnp.sort(jax.random.randint(
            kr, (N_EDGES,), 0, N_NODES, jnp.int32))
        senders = jax.random.randint(ks, (N_EDGES,), 0, N_NODES, jnp.int32)
        mask = jnp.ones((N_EDGES,), bool)
        d = jax.random.normal(kd, (N_EDGES, DIM), jnp.float32)
        w = jax.random.normal(kw, (N_EDGES,), jnp.float32)
        plan = build_sorted_plan(senders, receivers, mask, N_NODES)
        ds = plan.sort(d)
        ws = plan.sort(w)
        return plan, ds, ws, ds.astype(jnp.bfloat16), ws.astype(jnp.bfloat16)

    _status("compiling input prep")
    plan, data_sorted, w_sorted, data_bf16, w_bf16 = prep(
        jax.random.key(seed))

    # framework path: weight fused into the sorted-native one-hot MXU matmul
    def agg_op(i, d, w, pl):
        w = w * (1.0 + i.astype(jnp.float32) * 1e-6)
        return sorted_aggregate_weighted(d, w, pl, interpret)[0, 0]

    # bf16 data path (the shipped BC fast operating point): edge features
    # ride at half the HBM traffic; the kernel accumulates in f32.
    def bf16_op(i, d, w, pl):
        w = w * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
        out = sorted_aggregate_weighted(d, w, pl, interpret)
        return out[0, 0].astype(jnp.float32)

    t_agg = _time_op(agg_op, "spmm/fused-f32", data_sorted, w_sorted, plan)
    _status(f"headline f32: {N_EDGES / t_agg / 1e6:.1f}M edges/s")
    t_bf16 = None
    if _elapsed() < GUARD_S:
        t_bf16 = _time_op(bf16_op, "spmm/fused-bf16", data_bf16, w_bf16, plan)
    else:
        _status("guard tripped; skipping bf16")
    return {
        "f32": N_EDGES / t_agg,
        "bf16": N_EDGES / t_bf16 if t_bf16 else None,
    }, (plan, data_sorted)


def bench_xla_baseline(seed=0):
    """The torch_scatter-equivalent XLA baseline alone: scatter-add of the
    materialized ``data * w`` edge tensor.  Split out because the TPU
    compiler chews 200-350 s on this one scatter program (the framework
    programs all compile in 1-3 s) and the axon service occasionally hangs
    on it -- ``main`` runs it in a SUBPROCESS with its own timeout so a
    hang degrades ``vs_baseline`` instead of losing the round's metric."""
    from hierarchicalgnn_tpu.ops.segment import segment_sum

    @jax.jit
    def prep(key):  # on-device generation: see bench_spmm.prep
        kr, kd, kw = jax.random.split(key, 3)
        receivers = jnp.sort(jax.random.randint(
            kr, (N_EDGES,), 0, N_NODES, jnp.int32))
        d = jax.random.normal(kd, (N_EDGES, DIM), jnp.float32)
        w = jax.random.normal(kw, (N_EDGES,), jnp.float32)
        return d, w, receivers

    data, wbase, receivers = prep(jax.random.key(seed))

    def xla_op(i, d, w, r):
        w = w * (1.0 + i.astype(jnp.float32) * 1e-6)
        out = segment_sum(d * w[:, None], r, N_NODES,
                          indices_are_sorted=True)
        return out[0, 0]

    t_xla = _time_op(xla_op, "spmm/xla-baseline", data, wbase, receivers)
    return N_EDGES / t_xla


def bench_sddmm(spmm_arrays, seed=0):
    """SDDMM throughputs at the framework's call-site formulations:

    * ``cosine_emb8``: edge_cosine_likelihood, the f32-island clustering
      likelihood (reference ``Modules/BipartiteClassification/Models/
      HGNN_GMM.py:188``) -- two-gather XLA at emb_dim=8.
    * ``dot_d256``: the sorted-native Pallas SDDMM kernel
      (ops/pallas/sddmm_kernel.py) -- per-edge <edge_vec, row[receiver]>
      at latent width over the receiver-sorted plan, the formulation the
      framework actually executes (edge tensors live in plan order; this
      is every weighted-convolution VJP's d_w and the kernel behind
      edge-likelihood-style ops).  Reference parity target: the per-edge
      einsum at ``Modules/gnn_utils.py:208``.
    * ``dot_d256_xla_gather``: the reference-shaped two-random-gather XLA
      formulation, kept for comparison (this was the only dot_d256 number
      through round 3).
    """
    from hierarchicalgnn_tpu.ops.pallas.sddmm_kernel import sorted_sddmm
    from hierarchicalgnn_tpu.ops.pallas.sorted_agg import (
        build_sorted_plan, build_transposed_plan, gather_edge_endpoints)
    from hierarchicalgnn_tpu.ops.sddmm import (
        cosine_from_endpoints, edge_cosine_likelihood, edge_dot,
        normalize_unit_f32)

    interpret = jax.default_backend() != "tpu"
    plan, data_sorted = spmm_arrays

    @jax.jit
    def prep(key):  # on-device generation: see bench_spmm.prep
        ks, kr, ke, kf = jax.random.split(key, 4)
        senders = jax.random.randint(ks, (N_EDGES,), 0, N_NODES, jnp.int32)
        receivers = jax.random.randint(kr, (N_EDGES,), 0, N_NODES, jnp.int32)
        mask = jnp.ones((N_EDGES,), bool)
        emb = jax.random.normal(ke, (N_NODES, 8), jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        feat = jax.random.normal(kf, (N_NODES, DIM), jnp.float32)
        # the production clustering formulation (models/blocks.py): a
        # receiver-sorted plan + transposed plan over the SAME edges
        cplan = build_sorted_plan(senders, receivers, mask, N_NODES)
        cplan_t, c_r2s = build_transposed_plan(cplan, senders, receivers,
                                               mask, N_NODES)
        return senders, receivers, mask, emb, feat, cplan, cplan_t, c_r2s

    (senders, receivers, mask, emb, feat, cplan, cplan_t,
     c_r2s) = prep(jax.random.key(seed))

    def cos_op(i, e, s, r, m):
        out = edge_cosine_likelihood(
            e * (1.0 + i.astype(jnp.float32) * 1e-6), s, r, mask=m)
        return out[0]

    def cos_sorted_op(i, e, m, pl, pl_t, r2s):
        # the round-5 production path: blocked-CSR one-hot MXU endpoint
        # gather (ops/pallas/sorted_agg.gather_edge_endpoints) + fused VPU
        # dot -- exactly models/blocks.py::clustering's endpoint_gather
        en = normalize_unit_f32(e * (1.0 + i.astype(jnp.float32) * 1e-6))
        x_s, x_r = gather_edge_endpoints(en, pl, pl_t, r2s, interpret)
        return cosine_from_endpoints(x_s, x_r, mask=m)[0]

    def dot_kernel_op(i, d, rows, pl):
        rows = rows * (1.0 + i.astype(jnp.float32) * 1e-6)
        return sorted_sddmm(d, rows, pl, interpret)[0]

    def dot_xla_op(i, fe, s, r, m):
        out = edge_dot(fe * (1.0 + i.astype(jnp.float32) * 1e-6), fe,
                       s, r, mask=m)
        return out[0]

    t_cos_sorted = _time_op(cos_sorted_op, "sddmm/cosine-emb8-sorted", emb,
                            cplan.edge_mask_sorted, cplan, cplan_t, c_r2s)
    t_cos = t_dot = t_xla = None
    if _elapsed() < GUARD_S:
        t_cos = _time_op(cos_op, "sddmm/cosine-emb8-xla-gather", emb,
                         senders, receivers, mask)
    if _elapsed() < GUARD_S + 60:
        t_dot = _time_op(dot_kernel_op, f"sddmm/dot-d{DIM}-kernel",
                         data_sorted, feat, plan)
    if _elapsed() < GUARD_S + 60:
        t_xla = _time_op(dot_xla_op, f"sddmm/dot-d{DIM}-xla", feat, senders,
                         receivers, mask)
    return {"cosine_emb8": N_EDGES / t_cos_sorted,
            "cosine_emb8_xla_gather": N_EDGES / t_cos if t_cos else None,
            f"dot_d{DIM}": N_EDGES / t_dot if t_dot else None,
            f"dot_d{DIM}_xla_gather": N_EDGES / t_xla if t_xla else None}


def env_fingerprint():
    """Environment fingerprint (VERDICT r4 weak 4: round-over-round drift
    was unattributable without one): library versions, backend identity,
    and a FIXED-shape reference matmul time -- the same [2048]^3 f32
    matmul forever, so axon service/toolchain drift separates from repo
    code changes in later rounds' A/Bs.
    """
    import importlib.metadata as md

    fp = {"jax": jax.__version__}
    for pkg in ("jaxlib", "libtpu"):
        try:
            fp[pkg] = md.version(pkg)
        except md.PackageNotFoundError:
            fp[pkg] = None
    fp["backend"] = jax.default_backend()
    try:
        dev = jax.devices()[0]
        fp["device_kind"] = getattr(dev, "device_kind", None)
        fp["platform_version"] = getattr(dev.client, "platform_version", None)
    except Exception:
        pass

    def ref_op(i, a, b):
        a = a * (1.0 + i.astype(jnp.float32) * 1e-6)
        return jnp.dot(a, b)[0, 0]

    key = jax.random.key(1234)
    a = jax.random.normal(key, (2048, 2048), jnp.float32)
    t = _time_op(ref_op, "ref-matmul-2048", a, a, iters=32)
    fp["ref_matmul_2048_ms"] = round(t * 1e3, 4)
    return fp


_REPORT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_report.json")


def _xla_baseline_subprocess():
    """(edges_per_s, source): measured in a killable subprocess, else the
    last committed measurement from bench_report.json, else None."""
    import subprocess

    budget = max(60.0, 560.0 - _elapsed())
    _status(f"xla baseline subprocess (timeout {budget:.0f}s)")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--xla-only"],
            capture_output=True, text=True, timeout=budget)
        if out.returncode == 0:
            return float(json.loads(out.stdout.strip().splitlines()[-1])
                         ["xla_f32"]), "measured"
        _status(f"xla subprocess rc={out.returncode}: {out.stderr[-300:]}")
    except subprocess.TimeoutExpired:
        _status("xla subprocess timed out")
    try:  # fall back to the last successful measurement -- but only when
        # it was taken on the same backend and shape (a CPU-run or
        # different-shape cache entry would silently skew the headline)
        with open(_REPORT_PATH) as f:
            doc = json.load(f)
        prev = doc["spmm_edges_per_s"]["xla_f32"]
        shape_now = {"n_nodes": N_NODES, "n_edges": N_EDGES, "dim": DIM}
        if prev and doc.get("backend") == jax.default_backend() \
                and doc.get("shape") == shape_now:
            return float(prev), "cached_previous_run"
        if prev:
            _status("cached xla baseline is from a different backend/shape; "
                    "refusing it")
    except Exception:
        pass
    return None, "unavailable"


def main():
    if "--xla-only" not in sys.argv:
        # Single-tenant chip: detect a concurrent device user up front and
        # name it, instead of racing it and reading the loser's stalls as
        # service flakiness.  Warn-and-proceed on timeout -- the round's
        # headline metric must not be lost to a wedged holder.  (The
        # --xla-only child skips this: its parent holds the lock for it.)
        from hierarchicalgnn_tpu.utils import device_lock
        device_lock.acquire(wait_s=300.0, on_timeout="proceed",
                            status=_status)
    _warmup_readback()
    if "--xla-only" in sys.argv:
        print(json.dumps({"xla_f32": bench_xla_baseline()}), flush=True)
        return

    try:
        fingerprint = env_fingerprint()
    except Exception as e:  # never lose the headline to the fingerprint
        _status(f"fingerprint failed: {e!r}")
        fingerprint = None
    spmm, spmm_arrays = bench_spmm()
    # Guard BEFORE committing to more remote compiles: the headline metric
    # must print even on a degraded compile service.
    sddmm = None
    if _elapsed() < GUARD_S:
        try:
            sddmm = bench_sddmm(spmm_arrays)
        except Exception as e:  # never lose the headline to a side metric
            _status(f"sddmm failed: {e!r}")
    else:
        _status("wall-clock guard tripped; skipping sddmm")
    xla, xla_source = _xla_baseline_subprocess()

    rnd = lambda v: round(v) if v else None
    report = {
        "spmm_edges_per_s": {**{k: rnd(v) for k, v in spmm.items()},
                             "xla_f32": rnd(xla)},
        "xla_baseline_source": xla_source,
        "sddmm_edges_per_s": (
            {k: rnd(v) for k, v in sddmm.items()} if sddmm else None),
        "shape": {"n_nodes": N_NODES, "n_edges": N_EDGES, "dim": DIM},
        "backend": jax.default_backend(),
        "fingerprint": fingerprint,
        "wall_s": round(_elapsed(), 1),
    }
    with open(_REPORT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "metric": "spmm_edges_per_s_per_chip",
        "value": round(spmm["f32"]),          # framework path, NOT min()
        "unit": "edges/s",
        "vs_baseline": (round(spmm["f32"] / xla, 4) if xla else None),
        "vs_baseline_source": xla_source,
        "bf16_edges_per_s": rnd(spmm["bf16"]),
        "sddmm_cosine_edges_per_s": rnd(sddmm["cosine_emb8"]) if sddmm
        else None,
        "sddmm_dot_d256_edges_per_s": rnd(sddmm.get(f"dot_d{DIM}"))
        if sddmm else None,
        "fingerprint": fingerprint,
    }), flush=True)


if __name__ == "__main__":
    main()
