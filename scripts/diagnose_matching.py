"""Offline auction diagnosis on a dumped warm pair-score matrix (CPU).

Compares matching variants on /tmp/warm_matching.npz: round counts,
unmatched-row counts, and objective vs the scipy exact oracle.

Usage: python scripts/diagnose_matching.py [--npz /tmp/warm_matching.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def scipy_oracle(scores, p, c):
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    dense = scores[:p, :c]
    rows, cols = np.nonzero(dense)
    data = dense[rows, cols].astype(np.float64)
    vrows, vcols = np.arange(p), c + np.arange(p)
    mat = csr_matrix(
        (np.concatenate([data, np.full(p, 1e-12)]),
         (np.concatenate([rows, vrows]), np.concatenate([cols, vcols]))),
        shape=(p, c + p))
    r, cc = min_weight_full_bipartite_matching(mat, maximize=True)
    assign = {int(a): int(b) for a, b in zip(r, cc) if b < c}
    return assign, sum(dense[a, b] for a, b in assign.items())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/warm_matching.npz")
    args = ap.parse_args()

    d = np.load(args.npz)
    scores = d["pair_scores"]
    p, c = int(d["n_particles"]), int(d["n_clusters"])
    print(f"P={p} C={c} score range [{scores[:p,:c].min():.4g}, "
          f"{scores[:p,:c].max():.4g}] nnz="
          f"{(scores[:p,:c] > 0).sum()}")

    t0 = time.time()
    _, oracle_total = scipy_oracle(scores, p, c)
    oracle_total = float(oracle_total)
    print(f"scipy oracle: total={oracle_total:.3f} ({time.time()-t0:.2f}s)")

    from hierarchicalgnn_tpu.train.auction import auction_match

    rows_out = []
    for tag, kw in [
            ("eps=1e-4 cap256", dict(eps=1e-4, max_iters=256)),
            ("eps=1e-4 cap1024", dict(eps=1e-4, max_iters=1024)),
            ("eps=1e-4 cap8192", dict(eps=1e-4, max_iters=8192)),
            ("eps=1e-2 cap1024", dict(eps=1e-2, max_iters=1024)),
            ("eps=1e-3 cap8192", dict(eps=1e-3, max_iters=8192)),
            # data-scaled points: the production default (1e-3) and the
            # flagship scaling operating point (1e-2); see train/auction.py
            ("scale=1e-3 (default)", dict(eps_scale=1e-3)),
            ("scale=3e-3", dict(eps_scale=3e-3)),
            ("scale=1e-2 (flagship)", dict(eps_scale=1e-2)),
            ("scale=3e-2", dict(eps_scale=3e-2)),
    ]:
        cm, mt, it, nun = auction_match(jnp.asarray(scores), p, c,
                                        return_iters=True, **kw)
        cm, mt = np.asarray(cm), np.asarray(mt)
        total = float(scores[np.arange(len(cm))[mt], cm[mt]].sum())
        gap = float(oracle_total) - total
        print(f"{tag:22s} rounds={int(it):5d} "
              f"unassigned_at_cap={int(nun):4d} "
              f"matched={int(mt.sum()):4d} total={total:9.3f} "
              f"gap={gap:9.4f}")
        rows_out.append({"variant": tag, "rounds": int(it),
                         "unassigned_at_cap": int(nun),
                         "matched": int(mt.sum()),
                         "objective": round(total, 3),
                         "gap": round(float(gap), 4),
                         "gap_pct": round(100 * float(gap)
                                          / max(oracle_total, 1e-9), 4)})

    import json
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "matching_eps_sweep_r05.json")
    with open(out, "w") as f:
        json.dump({"metric": "auction_eps_sweep",
                   "instance": {"npz": os.path.basename(args.npz),
                                "P": p, "C": c,
                                "nnz": int((scores[:p, :c] > 0).sum()),
                                "oracle_objective": round(float(oracle_total),
                                                          3)},
                   "note": ("Warm-flagship pair-score matrix dumped by "
                            "profile_phases.py at the 40-step warm state "
                            "(the auction's hardest measured regime). "
                            "rounds drives BOTH the replicated matching "
                            "cost (0.35 ms/round on-chip) and the sharded "
                            "auction's per-round collective latency."),
                   "sweep": rows_out}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
