"""On-chip auction-matching cost at the real warm-flagship instance.

Times ``train/auction.py::auction_match`` on the TPU against the warm
pair-score matrix dumped by profile_phases.py
(benchmarks/warm_matching_r05.npz), across the operating points the
round-5 scale-out account uses:

  * eps_scale 1e-3 (conservative default) vs 1e-2 (shipped flagship)
  * tail_cap 0 (full [P, C] sweep every round) vs 256 (tail compaction)

Together with the CPU round/gap sweep (diagnose_matching.py ->
benchmarks/matching_eps_sweep_r05.json) this pins the matching term of
the warm-state scaling projection (scripts/collective_audit.py
--warm-step-ms/--matching-*): per-round full-sweep cost, per-round tail
cost, and the end-to-end warm matching time the single-chip step pays.

Timing per bench.py: k calls inside one jit (i-perturbed scores so XLA
cannot hoist), scalar readback, 1-call calibration subtracted.

Usage (single-tenant chip):
    python scripts/probe_matching_chip.py [--iters 4] \
        [--npz benchmarks/warm_matching_r05.npz] \
        [--out benchmarks/probe_matching_r05.json]
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


def _status(msg):
    print(f"[probe-matching] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "warm_matching_r05.npz"))
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hierarchicalgnn_tpu.train.auction import auction_match
    from hierarchicalgnn_tpu.utils import device_lock

    device_lock.acquire(wait_s=1800.0, status=_status)
    _status("warmup readback")
    float(jnp.zeros(()).sum())

    d = np.load(args.npz)
    scores_np = d["pair_scores"].astype(np.float32)
    p, c = int(d["n_particles"]), int(d["n_clusters"])
    # pad rows to the flagship max_particles multiple the sharded path
    # uses (4096); auction cost scales with the padded shape
    p_pad = 4096
    if scores_np.shape[0] < p_pad:
        scores_np = np.pad(scores_np,
                           ((0, p_pad - scores_np.shape[0]), (0, 0)))
    scores = jnp.asarray(scores_np)
    _status(f"instance P={p} C={c} padded {scores.shape}")

    results = {}
    for tag, kw in [
            ("default_full", dict(eps_scale=1e-3, tail_cap=0)),
            ("default_tail256", dict(eps_scale=1e-3, tail_cap=256)),
            ("shipped_full", dict(eps_scale=1e-2, tail_cap=0)),
            ("shipped_tail256", dict(eps_scale=1e-2, tail_cap=256)),
    ]:
        @jax.jit
        def f(n, s):
            def body(i, acc):
                cm, mt = auction_match(
                    s * (1.0 + i.astype(jnp.float32) * 1e-9), p, c, **kw)
                return acc + jnp.sum(mt.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, 0.0)

        _status(f"compiling {tag}")
        float(f(1, scores))
        t0 = time.perf_counter()
        float(f(args.iters + 1, scores))
        t_many = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(1, scores))
        t_one = time.perf_counter() - t0
        ms = max((t_many - t_one) / args.iters, 1e-9) * 1e3
        _, _, it, nun = auction_match(scores, p, c, return_iters=True, **kw)
        results[tag] = {"ms": round(ms, 2), "rounds": int(it),
                        "unassigned": int(nun), **kw}
        _status(f"{tag}: {ms:.1f} ms, {int(it)} rounds")

    full, tail = results["shipped_full"], results["shipped_tail256"]
    report = {
        "metric": "warm_matching_onchip",
        "instance": {"P": p, "C": c, "p_padded": p_pad,
                     "npz": os.path.basename(args.npz)},
        "results": results,
        "per_round_full_ms": round(full["ms"] / max(full["rounds"], 1), 4),
        "note": ("auction_match on the real warm pair-score matrix; "
                 "matching term of the warm-state scaling projection "
                 "(collective_audit.py).  The sharded-axis variant has "
                 "bit-identical rounds (tests/test_auction.py); its "
                 "per-chip cost is (bulk rounds x full-sweep/G + tail "
                 "rounds x tail-sweep) + 2 [C]-collectives/round."),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "probe_matching_r05.json")
    with open(out, "w") as f2:
        json.dump(report, f2, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
