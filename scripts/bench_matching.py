"""Time auction_match on the dumped real warm score matrix (TPU).

Compares the XLA bidding round against the Pallas one-pass top-2 round,
and fixed-eps against eps-escalation, via the fori_loop+readback pattern
(axon's block_until_ready returns early).

Usage: python scripts/bench_matching.py [--npz /tmp/warm_matching.npz]
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

from hierarchicalgnn_tpu.train.auction import auction_match  # noqa: E402


def timed(op, iters=8):
    def make(n):
        @jax.jit
        def f():
            def body(i, acc):
                return acc + op(i)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    f_many, f_one = make(iters), make(1)
    float(f_many())
    float(f_one())
    t0 = time.perf_counter()
    float(f_many())
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_one())
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="/tmp/warm_matching.npz")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    d = np.load(args.npz)
    scores = jnp.asarray(d["pair_scores"])
    p, c = int(d["n_particles"]), int(d["n_clusters"])
    print(f"shape={scores.shape} P={p} C={c} "
          f"backend={jax.default_backend()}", flush=True)

    results = {}
    for tag, kw in [
            ("xla_escalate", dict(use_pallas=False)),
            ("pallas_escalate", dict(use_pallas=True)),
            ("xla_fixed_cap", dict(use_pallas=False, escalate_every=0)),
            ("pallas_fixed_cap", dict(use_pallas=True, escalate_every=0)),
    ]:
        def op(i, kw=kw):
            cm, mt, it, nun = auction_match(
                scores * (1.0 + i.astype(jnp.float32) * 1e-9), p, c,
                return_iters=True, **kw)
            return it.astype(jnp.float32) + jnp.sum(mt) * 0.0

        t = timed(op, args.iters)
        cm, mt, it, nun = jax.jit(
            lambda: auction_match(scores, p, c, return_iters=True, **kw))()
        results[tag] = {"ms": round(t * 1e3, 2), "rounds": int(it),
                        "unassigned": int(nun), "matched": int(mt.sum())}
        print(f"{tag:18s} {results[tag]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
