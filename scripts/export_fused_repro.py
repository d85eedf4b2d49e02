"""Serialize the minimal fused-step TPU compiler SIGSEGV as StableHLO.

The bisection ladder (scripts/bisect_fused_crash.py,
benchmarks/bisect_fused_r04.json) established that at the shipped
Embedding-HGNN-GMM operating point (Pallas + bf16, padding 1024/2048,
max_clusters 512) ``value_and_grad(loss)`` COMPILES while adding ANY
fused parameter update -- even ``p - 1e-3*g`` with no optax, donation or
metric packing -- SIGSEGVs the TPU compiler.  This script exports that
minimal crashing program (the ladder's ``grad_sgd`` rung) with
``jax.export`` and writes:

  benchmarks/repro_fused_sigsegv.stablehlo.bin   serialized artifact
  benchmarks/repro_fused_sigsegv.json            metadata + fingerprint

Upstream can reproduce with::

    import jax
    exported = jax.export.deserialize(open(path, 'rb').read())
    exported.call(*flat_args)     # or compile the MLIR module directly

Run WITH the TPU backend visible (the model's Pallas kernels must lower
through Mosaic, not interpret mode): lowering/serialization is
device-light; no timed compute runs.  ``--compile`` additionally
attempts the doomed compile to confirm the crash is still live.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bisect_fused_crash import build  # noqa: E402 (scripts/ sibling)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "repro_fused_sigsegv"))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--compile", action="store_true",
                    help="also attempt the doomed compile (expected crash)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"WARNING: backend is {backend!r}; Pallas kernels will export "
              "in interpret form, which does NOT reproduce the crash")

    pipeline, _, state, batch = build(use_pallas=True, dtype=args.dtype)

    def grad_sgd(params, buffers, batch):
        def loss_fn(p):
            loss, (nb, m) = pipeline.loss(p, buffers, batch, 0,
                                          training=True)
            return loss

        grads = jax.grad(loss_fn)(params)
        return jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads)

    # jax.export refuses PyTreeDefs with unregistered custom nodes; the
    # batch/buffer trees carry the package's NamedTuple containers.
    from hierarchicalgnn_tpu.data.event import Event
    from hierarchicalgnn_tpu.ops.gmm import GMM2
    from hierarchicalgnn_tpu.ops.graph import Graph
    for cls in (Graph, GMM2, Event):
        try:
            jax.export.register_namedtuple_serialization(
                cls,
                serialized_name=f"{cls.__module__}.{cls.__name__}")
        except ValueError:
            pass  # already registered (repeated runs in one process)

    print("lowering + exporting (no compile)...", flush=True)
    exported = jax.export.export(jax.jit(grad_sgd))(
        state.params, state.buffers, batch)
    blob = exported.serialize()
    with open(args.out + ".stablehlo.bin", "wb") as f:
        f.write(blob)

    from hierarchicalgnn_tpu.utils.env import toolchain_fingerprint
    meta = {
        "artifact": os.path.basename(args.out) + ".stablehlo.bin",
        "bytes": len(blob),
        "program": "grad(Embedding-HGNN-GMM loss) + p - 1e-3*g "
                   "(bisect ladder rung 'grad_sgd', the minimal crasher)",
        "operating_point": {"use_pallas": True, "compute_dtype": args.dtype,
                            "n_nodes_max": 1024, "n_edges_max": 2048,
                            "max_clusters": 512},
        "expected": "TPU compiler SIGSEGV (surfaces as JaxRuntimeError "
                    "INTERNAL through the remote compile service)",
        "fingerprint": toolchain_fingerprint(),
        "backend": backend,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta, indent=2))

    if args.compile:
        print("attempting the doomed compile...", flush=True)
        try:
            out = grad_sgd(state.params, state.buffers, batch)
            print("COMPILED AND RAN (crash no longer reproduces): loss leaf",
                  float(jax.tree.leaves(out)[0].ravel()[0]))
        except Exception as e:
            print(f"crash reproduced: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
