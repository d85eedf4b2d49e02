"""Compiler-derived ICI collective audit of the sharded flagship step.

Multi-chip hardware is not reachable from this environment (one v5e chip
via the axon tunnel), so the multi-chip scaling efficiency cannot be
*measured*.  What CAN be pinned down exactly is the collective traffic the
sharded program actually emits: this script compiles the production
graph-partitioned train step (``parallel/graph_shard.py``) for a
{graph: G} mesh on G virtual CPU devices at the FLAGSHIP regime (24k
nodes / 49k directed-edge capacity, latent 256, 6+6 iterations, bf16 data
path -- the same shape as the measured single-chip anchor in
``benchmarks/scaling_r04.json``) and walks the optimized HLO for every
collective op, summing per-chip ring traffic:

    all-gather          out_bytes * (G-1)/G
    all-reduce          2 * out_bytes * (G-1)/G
    reduce-scatter      out_bytes * (G-1)          (out = the shard)
    collective-permute  out_bytes
    all-to-all          out_bytes * (G-1)/G

Combined with the MEASURED anchor (sharded step at graph=1: 419.5 ms,
1.1% over unsharded) this yields a defensible projection of scaling
efficiency: eff(G) = T / (G * (rho*T + (1-rho)*T/G + t_ici(G))), reported
for a range of replicated-fraction rho values, where rho is bounded by
the warm-state phase probes (the pooled space that stays replicated:
connected components ~15 ms, GMM-EM+cut ~1.4 ms, supergraph kNN ~2 ms,
auction matching 0.3-34 ms => roughly 5-12% of the step; see
docs/DESIGN.md "Phase costs").  t_ici assumes NO compute/collective
overlap (conservative) at the stated per-chip ring bandwidth.

Usage (CPU-only; safe to run alongside a TPU job):
    python scripts/collective_audit.py [--devices 8] \
        [--out benchmarks/collective_audit_r04.json]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pre-scan --devices BEFORE importing jax (advisor r4): the device count
# must be baked into XLA_FLAGS at backend init, so argparse alone cannot
# honor --devices > 8.
def _prescan_devices(default=8):
    for i, a in enumerate(sys.argv):
        if a == "--devices" and i + 1 < len(sys.argv):
            return int(sys.argv[i + 1])
        if a.startswith("--devices="):
            return int(a.split("=", 1)[1])
    return default


_N_DEVICES = _prescan_devices()
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    f" --xla_force_host_platform_device_count={_N_DEVICES}").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FLAGSHIP = {
    "n_nodes_max": 24576,
    "n_edges_max": 49152,
    "max_clusters": 3072,
    "max_particles": 4096,
    "train_split": [1, 1, 1],
    # CPU compile: the Pallas kernels are hardware-validated elsewhere and
    # emit no collectives; the XLA aggregation path compiles everywhere.
    "use_pallas": False,
}

_DTYPE_BYTES = {"pred": 1, "u8": 1, "s8": 1, "bf16": 2, "f16": 2, "u16": 2,
                "s16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def _status(msg):
    print(f"[collective-audit] {msg}", file=sys.stderr, flush=True)


def _shape_bytes(shape_str):
    """bytes of one 'dtype[d0,d1]{...}' token."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def parse_collectives(hlo_text):
    """[(op_kind, result_bytes, line)] for every collective instruction.

    Async pairs are counted once (the -start carries the result shape);
    the result may be a tuple -- sum its array components, skipping the
    operand aliases async-start tuples carry.
    """
    found = []
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"%?[\w.\-]+ = (.+?) (" + "|".join(_COLLECTIVES) +
                     r")(-start)?\(", s)
        if not m:
            continue
        if re.search(r"(all-gather|all-reduce|reduce-scatter|all-to-all|"
                     r"collective-permute)-done", s):
            continue
        result, kind, started = m.group(1), m.group(2), m.group(3)
        tokens = re.findall(r"\w+\[[\d,]*\]", result)
        if started and len(tokens) >= 2:
            # async-start result tuple = (operands..., results..., ctx):
            # a variadic start carries k operand aliases then k results
            # (advisor r4: tokens[1:2] undercounted variadic starts).
            # Sum the RESULT components: the second half of the
            # (operand, result) pairs.
            k = len(tokens) // 2
            tokens = tokens[k:2 * k]
        nbytes = sum(_shape_bytes(t) for t in tokens)
        if nbytes:
            found.append((kind, nbytes, s[:160]))
    return found


def ring_traffic_bytes(kind, nbytes, g):
    """Per-chip bytes a ring implementation moves for one collective."""
    if kind == "all-gather":
        return nbytes * (g - 1) / g
    if kind == "all-reduce":
        return 2 * nbytes * (g - 1) / g
    if kind == "reduce-scatter":
        return nbytes * (g - 1)
    if kind == "collective-permute":
        return nbytes
    if kind == "all-to-all":
        return nbytes * (g - 1) / g
    return 0


def _warm_projection(args, colls):
    """Efficiency projection at the MEASURED WARM state (the state that
    exposed the auction matching as the dominant would-be-replicated
    phase): the matching runs row-SHARDED over the graph axis
    (train/auction.py ``axis``), so its bidding compute divides by G
    while each round pays one [C] f32 pmax + one [C] i32 pmin of
    collective latency.  Round count at the shipped matching_eps_scale
    comes from the committed sweep on the real warm pair-score matrix.
    bf16-adjusted ici scale (0.5x) per the cpu_lowering_caveat."""
    if args.warm_step_ms is None or args.matching_warm_ms is None:
        return None
    t_warm = args.warm_step_ms
    m_meas = args.matching_warm_ms
    m_ship = (args.matching_ship_ms if args.matching_ship_ms is not None
              else m_meas * args.matching_rounds
              / args.matching_rounds_measured)
    repl = args.replicated_ms or 0.0
    if args.matching_ship_ms is None:
        # the phase probe's replicated remainder includes the loss (and
        # so the matching) -- remove the matching part, now sharded
        repl = max(repl - m_meas, 3.0)
    # else: the caller passed the non-matching remainder directly
    # (itemized: GMM-EM+cut 1.4, super-kNN 3.9, partition argsorts 0.1,
    # CC pointer-jump residue 6.2, label compaction 0.7)
    t1 = t_warm - m_meas + m_ship          # 1-chip step at the shipped eps
    par = max(t1 - repl - m_ship, 0.0)
    rows = []
    for gi in (2, 4, 8):
        traffic = 0.5 * sum(ring_traffic_bytes(k, b, gi)
                            for k, b, _ in colls)
        t_ici = traffic / (args.ring_gbps * 1e9) * 1e3
        t_auction = (m_ship / gi
                     + args.matching_rounds * args.auction_round_us * 1e-3)
        t_g = repl + par / gi + t_auction + t_ici
        rows.append({
            "devices": gi,
            "t_ici_ms": round(t_ici, 3),
            "t_auction_sharded_ms": round(t_auction, 2),
            "t_step_ms": round(t_g, 2),
            "efficiency": round(t1 / (gi * t_g), 4)})
    return {
        "inputs": {
            "warm_step_ms_at_default_eps": t_warm,
            "matching_warm_ms_at_default_eps": m_meas,
            "matching_rounds_default": args.matching_rounds_measured,
            "matching_rounds_shipped": args.matching_rounds,
            "matching_ms_shipped": round(m_ship, 1),
            "one_chip_warm_step_ms_shipped_eps": round(t1, 1),
            "replicated_remainder_ms_excl_matching": round(repl, 1),
            "auction_round_us": args.auction_round_us,
        },
        "rows": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--particles", type=int, default=3000)
    ap.add_argument("--anchor-ms", type=float, default=419.5,
                    help="measured sharded graph=1 flagship step "
                         "(benchmarks/scaling_r04.json)")
    ap.add_argument("--ring-gbps", type=float, default=90.0,
                    help="assumed per-chip ring bandwidth, GB/s (v5e: 4 ICI "
                         "links; a bidirectional 1D ring uses 2 at ~45 GB/s)")
    ap.add_argument("--replicated-ms", type=float, default=None,
                    help="measured replicated-remainder time under the "
                         "pooled partition (chip phase probes); adds a "
                         "rho=measured row to the projection")
    ap.add_argument("--warm-step-ms", type=float, default=None,
                    help="measured WARM-state flagship step "
                         "(profile_phases train_step_warm); enables the "
                         "warm_state_projection section")
    ap.add_argument("--matching-warm-ms", type=float, default=None,
                    help="measured warm auction matching cost, replicated "
                         "(profile_phases matching_warm_ms)")
    ap.add_argument("--matching-rounds-measured", type=int, default=633,
                    help="auction rounds at which --matching-warm-ms was "
                         "measured (eps_scale=1e-3 default point)")
    ap.add_argument("--matching-rounds", type=int, default=218,
                    help="auction rounds at the SHIPPED eps point "
                         "(matching_eps_scale, "
                         "benchmarks/matching_eps_sweep_r05.json)")
    ap.add_argument("--matching-ship-ms", type=float, default=None,
                    help="MEASURED 1-chip matching cost at the shipped "
                         "eps point, incl. the pair-matrix build "
                         "(probe_matching_r05.json shipped_tail256.ms + "
                         "the ~66 ms build the phases probe isolates); "
                         "overrides the rounds-ratio estimate")
    ap.add_argument("--auction-round-us", type=float, default=20.0,
                    help="per-round sharded-auction collective latency: "
                         "one [C] f32 pmax + one [C] i32 pmin "
                         "(train/auction.py axis mode)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.parallel.graph_shard import make_sharded_train_step
    from hierarchicalgnn_tpu.parallel.mesh import make_mesh
    from hierarchicalgnn_tpu.parallel.step import stack_events
    from hierarchicalgnn_tpu.train.trainer import Trainer

    g = args.devices
    assert jax.device_count() >= g, (jax.device_count(), g)

    hparams, model, pipeline = model_selector("BC-HGNN-GMM", FLAGSHIP)
    raw = generate_event(np.random.default_rng(0),
                         n_particles=args.particles)
    ev = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    _status(f"event: nodes {ev.x.shape[0]}, padded edges "
            f"{int(ev.graph.capacity)}; mesh graph={g}")

    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/coll_audit")
    # Abstract state: no flagship-shape init execution on the CPU host.
    state_shapes = jax.eval_shape(trainer.init_state, ev)
    batch = stack_events([ev])
    mesh = make_mesh(data=1, graph=g)
    step = make_sharded_train_step(pipeline, trainer.optimizer, mesh,
                                   hparams)

    _status("lowering + compiling the sharded train step (CPU)")
    compiled = step.lower(state_shapes, batch, 0).compile()
    colls = parse_collectives(compiled.as_text())
    _status(f"{len(colls)} collective instructions found")

    by_kind = {}
    for kind, nbytes, _ in colls:
        e = by_kind.setdefault(kind, {"count": 0, "result_bytes": 0})
        e["count"] += 1
        e["result_bytes"] += nbytes

    def project(gi, scale=1.0):
        traffic = scale * sum(ring_traffic_bytes(k, b, gi)
                              for k, b, _ in colls)
        t_ici_ms = traffic / (args.ring_gbps * 1e9) * 1e3
        T = args.anchor_ms
        row = {"devices": gi, "per_chip_traffic_MB": round(traffic / 1e6, 2),
               "t_ici_ms": round(t_ici_ms, 3), "efficiency_vs_rho": {}}
        rhos = [0.0, 0.01, 0.02, 0.035, 0.05, 0.10]
        labels = [f"rho={r:.2f}" for r in rhos]
        if args.replicated_ms is not None:
            rhos.append(args.replicated_ms / T)
            labels.append(f"rho=measured({args.replicated_ms}ms)")
        for rho, label in zip(rhos, labels):
            step_ms = rho * T + (1 - rho) * T / gi + t_ici_ms
            row["efficiency_vs_rho"][label] = round(T / (gi * step_ms), 4)
        return row

    report = {
        "metric": "ici_collective_audit",
        "note": ("Compiler-derived: optimized HLO of the production "
                 "graph-partitioned train step (flagship shape, bf16 data "
                 "path) on a virtual CPU mesh; per-chip ring traffic from "
                 "the emitted collectives; efficiency projected against "
                 "the MEASURED 1-chip anchor "
                 f"({args.anchor_ms} ms) assuming no compute/collective "
                 "overlap (conservative) at "
                 f"{args.ring_gbps} GB/s per-chip ring bandwidth.  rho = "
                 "fraction of the step that stays replicated.  Round 5: "
                 "the pooled space (supernode/superedge MLPs and "
                 "aggregations, connected components, bipartite kNN, "
                 "cluster means) is PARTITIONED (shard_pooled, "
                 "parallel/graph_shard.py) and the auction matching runs "
                 "row-SHARDED over the graph axis (train/auction.py; see "
                 "warm_state_projection); what remains replicated is "
                 "GMM-EM+cut (~1.4 ms), the C x C super-kNN (~4 ms), "
                 "edge-partition/plan argsorts, the non-matching loss and "
                 "the CC pointer jumps -- the measured remainder bound is "
                 "recorded in replicated_remainder_ms."),
        "shard_pooled": bool(hparams.get("shard_pooled", True)),
        "replicated_remainder_ms": args.replicated_ms,
        "while_loop_caveat": (
            "the sharded-CC hop all_gather([n_local] s32) sits inside a "
            "lax.while_loop and is counted once here though it executes "
            "up to ~64 times; its bytes (<1 MB total) are negligible but "
            "its latency term (~0.3-0.6 ms at 8 chips) does not shrink "
            "with G -- treat it as part of the replicated remainder"),
        "mesh": {"graph": g},
        "shape": {"n_nodes": int(ev.x.shape[0]),
                  "n_edges_padded": int(ev.graph.capacity),
                  "latent": hparams["latent"]},
        "collectives_by_kind": by_kind,
        "largest_collectives": sorted(
            ({"kind": k, "result_bytes": b, "hlo": l} for k, b, l in colls),
            key=lambda d: -d["result_bytes"])[:8],
        "projection": [project(gi) for gi in (2, 4, 8)],
        "warm_state_projection": _warm_projection(args, colls),
        # The CPU backend upcasts the bf16 data path to f32 before
        # lowering, so the [N, latent] halo gathers (and their backward
        # scatters) appear at twice their TPU width here.  The data-path
        # collectives dominate the byte total, so a uniform 0.5x scale is
        # a tight lower bound on on-chip traffic; the truth lies between
        # the two tables (parameter-grad all-reduces stay f32 on TPU too).
        "projection_bf16_adjusted": [project(gi, scale=0.5)
                                     for gi in (2, 4, 8)],
        "cpu_lowering_caveat": (
            "halo all-gathers show as f32[24576,256] fed by convert "
            "fusions: CPU XLA upcasts bf16 compute, doubling those "
            "entries vs the TPU lowering; see projection_bf16_adjusted"),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "collective_audit_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    _status(f"wrote {out}")
    print(json.dumps({k: v for k, v in report.items()
                      if k in ("collectives_by_kind", "projection")},
                     indent=2))


if __name__ == "__main__":
    main()
