"""Bisect the Embedding-HGNN-GMM fused-step TPU compiler SIGSEGV.

Round-3 finding (docs/DESIGN.md): at the shipped Pallas+bf16 operating
point (tight padding 1024/2048, max_clusters 512) the Trainer's FUSED
train-step program -- value_and_grad + optimizer update + grad-norm +
metric packing, donated state -- deterministically crashes the remote TPU
compile helper (surfaces as a JaxRuntimeError INTERNAL), while
``jit(value_and_grad(loss))`` alone compiles and runs.  The trainer
contains it by splitting the step (1.85x dispatch overhead).

This script compiles a ladder of program variants between those two
points to find the minimal crashing feature set:

  grad            value_and_grad(loss) only
  grad_opt        + optimizer update + param apply
  grad_opt_donate + donated input state
  grad_opt_gnorm  + grad-norm metric
  full_pack       + metric packing ([K] stack readback) == trainer step
  full_nodonate   full minus donation

Each variant compiles (and runs once) in a fresh attempt; INTERNAL
compiler errors are caught and recorded.  Run AFTER clearing the compile
cache for honesty: JAX_COMPILATION_CACHE off here so every attempt
actually exercises the compiler.

Usage: python scripts/bisect_fused_crash.py [--dtype bfloat16] [--pallas 1]
"""

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OVERRIDES = {
    "n_nodes_max": 1024,
    "n_edges_max": 2048,
    "max_clusters": 512,
    "max_particles": 128,
    "train_split": [2, 1, 1],
}


def _status(msg):
    print(f"[bisect] {msg}", flush=True)


def build(use_pallas, dtype):
    from hierarchicalgnn_tpu.data.event import preprocess_event
    from hierarchicalgnn_tpu.data.synthetic import generate_event
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.optim import make_optimizer
    from hierarchicalgnn_tpu.train.trainer import Trainer

    ov = dict(OVERRIDES, use_pallas=bool(use_pallas), compute_dtype=dtype)
    hparams, model, pipeline = model_selector("Embedding-HGNN-GMM", ov)
    raw = generate_event(np.random.default_rng(0), n_particles=120)
    batch = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/bisect")
    state = trainer.init_state(batch)
    return pipeline, trainer.optimizer, state, batch


def variants(pipeline, optimizer):
    def grad_only(state, batch, epoch):
        def loss_fn(params):
            loss, (nb, m) = pipeline.loss(params, state.buffers, batch,
                                          epoch, training=True)
            return loss, (nb, m)

        (loss, (nb, m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return loss, jax.tree.leaves(grads)[0]

    def make_step(gnorm=False, pack=False):
        def step(state, batch, epoch):
            def loss_fn(params):
                loss, (nb, m) = pipeline.loss(params, state.buffers, batch,
                                              epoch, training=True)
                return loss, (nb, m)

            (loss, (nb, m)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            new_state = state.replace(params=new_params, buffers=nb,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            m = dict(m)
            if gnorm:
                m["grad_norm"] = jnp.sqrt(sum(
                    jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
            if pack:
                names = tuple(sorted(m))
                out = jnp.stack([jnp.asarray(m[k], jnp.float32).reshape(())
                                 for k in names])
            else:
                out = m["training_loss"]
            return new_state, out

        return step

    def make_min_step(update):
        """grad + a minimal hand-written param update (no optax)."""
        def step(state, batch, epoch):
            def loss_fn(params):
                loss, (nb, m) = pipeline.loss(params, state.buffers, batch,
                                              epoch, training=True)
                return loss, (nb, m)

            (loss, (nb, m)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_params = update(state.params, grads)
            return state.replace(params=new_params, buffers=nb), loss

        return step

    def sgd(params, grads):
        return jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads)

    def clip_sgd(params, grads):
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                          for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, 0.5 / (gn + 1e-12)) * 1e-3
        return jax.tree.map(lambda p, g: p - scale * g, params, grads)

    return {
        "grad": (grad_only, ()),
        "grad_sgd": (make_min_step(sgd), ()),
        "grad_clip_sgd": (make_min_step(clip_sgd), ()),
        "grad_opt": (make_step(), ()),
        "grad_opt_donate": (make_step(), (0,)),
        "grad_opt_gnorm_donate": (make_step(gnorm=True), (0,)),
        "full_pack_donate": (make_step(gnorm=True, pack=True), (0,)),
        "full_pack_nodonate": (make_step(gnorm=True, pack=True), ()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    args = ap.parse_args()

    _status("warmup readback")
    float(jnp.zeros(()).sum())

    pipeline, optimizer, state, batch = build(args.pallas, args.dtype)
    results = {}
    for name, (fn, donate) in variants(pipeline, optimizer).items():
        if args.only and name not in args.only.split(","):
            continue
        _status(f"compiling variant {name} (donate={donate})")
        try:
            # fresh state copy per attempt (donation consumes buffers)
            s = jax.tree.map(jnp.array, state)
            jitted = jax.jit(fn, donate_argnums=donate)
            out = jitted(s, batch, 0)
            leaf = jax.tree.leaves(out)[-1]
            val = float(np.asarray(leaf).ravel()[0])
            results[name] = {"ok": True, "value": val}
            _status(f"  {name}: OK ({val:.5f})")
        except Exception as e:
            kind = type(e).__name__
            internal = "INTERNAL" in str(e)
            results[name] = {"ok": False, "error": kind,
                             "internal": internal,
                             "msg": str(e)[:300]}
            _status(f"  {name}: FAILED {kind} internal={internal}")
            traceback.print_exc(limit=2)
    print(json.dumps({"dtype": args.dtype, "pallas": bool(args.pallas),
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()
