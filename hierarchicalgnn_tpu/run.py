"""Command-line runner: train / resume / test / transfer.

Replaces the reference's ``Notebooks/script.py`` entry points (``main``,
``resume``, ``update``/``switch``, ``test``) with a single CLI:

  python -m hierarchicalgnn_tpu.run train --model 4 --run-dir runs/bc
  python -m hierarchicalgnn_tpu.run resume --run-dir runs/bc
  python -m hierarchicalgnn_tpu.run test --run-dir runs/bc
  python -m hierarchicalgnn_tpu.run transfer --run-dir runs/gmrt \
      --source-run runs/bc --model 5

Data comes from ``--input-dir`` (directory of preprocessed event files, see
``data.reader``) or the built-in synthetic generator when the config's
``input_dir`` is ``synthetic://`` (the default shipping config).
"""

from __future__ import annotations

import argparse
import json



def _load_events(hparams, args):
    n_events = sum(hparams["train_split"])
    input_dir = args.input_dir or hparams.get("input_dir", "synthetic://")
    if str(input_dir).startswith("synthetic://"):
        from hierarchicalgnn_tpu.data.synthetic import generate_dataset
        return generate_dataset(n_events, seed=42,
                                n_particles=args.synthetic_particles)
    from hierarchicalgnn_tpu.data.reader import load_event_dir
    return load_event_dir(input_dir, hparams["datatype_names"],
                          limit=n_events)


def _overrides(args):
    o = {}
    for kv in args.set or []:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    return o


def _build(args, model_name=None):
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.trainer import Trainer

    hparams, model, pipeline = model_selector(model_name or args.model,
                                              _overrides(args))
    trainer = Trainer(hparams, model, pipeline, run_dir=args.run_dir,
                      log_every_n_steps=args.log_every_n_steps)
    return hparams, model, pipeline, trainer


def cmd_train(args):
    hparams, model, pipeline, trainer = _build(args)
    events = _load_events(hparams, args)
    trainer.fit(events, max_epochs=args.max_epochs)


def cmd_resume(args):
    from hierarchicalgnn_tpu.train.checkpoint import load_hparams
    saved = load_hparams(args.run_dir)
    args.model = saved["model"]
    hparams, model, pipeline, trainer = _build(args)
    events = _load_events(hparams, args)
    trainset, _, _ = trainer.make_datasets(events)
    # prefer the newest checkpoint; fall back if e.g. a kill mid-save
    # destroyed `last` (orbax leaves only a .tmp dir behind, and restore
    # of a half-written dir raises ValueError rather than FileNotFoundError)
    names = ["last", "autosave", "best"]
    if args.checkpoint:                 # explicit --checkpoint wins
        names = [args.checkpoint] + [n for n in names
                                     if n != args.checkpoint]
    for name in names:
        try:
            state, epoch = trainer.restore(name, trainset[0][1])
            break
        except (FileNotFoundError, ValueError) as e:
            print(f"resume: checkpoint {name!r} unusable ({e}); trying next")
            continue
    else:
        raise FileNotFoundError(
            f"no restorable checkpoint in {args.run_dir} (tried {names})")
    if name != names[0]:
        print(f"resume: checkpoint {names[0]!r} missing, using {name!r} "
              f"(epoch {epoch})")
    trainer.fit(events, max_epochs=args.max_epochs, state=state,
                start_epoch=epoch + 1)


def cmd_test(args):
    from hierarchicalgnn_tpu.train.checkpoint import load_hparams
    saved = load_hparams(args.run_dir)
    args.model = saved["model"]
    hparams, model, pipeline, trainer = _build(args)
    events = _load_events(hparams, args)
    trainset, _, _ = trainer.make_datasets(events)
    state, _ = trainer.restore(args.checkpoint or "best", trainset[0][1])
    metrics = trainer.test(state, events)
    print(json.dumps(metrics))


def cmd_transfer(args):
    """Initialize a model from another run's checkpoint (strict=False),
    e.g. gMRT <- pretrained BC (reference ``script.py:53-173``)."""
    from hierarchicalgnn_tpu.train.checkpoint import load_hparams, transfer_params
    from hierarchicalgnn_tpu.models.registry import model_selector
    from hierarchicalgnn_tpu.train.trainer import Trainer as T

    hparams, model, pipeline, trainer = _build(args)
    events = _load_events(hparams, args)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])

    # restore with the SOURCE run's own model structure
    src_saved = load_hparams(args.source_run)
    src_hp, src_model, src_pipe = model_selector(src_saved["model"],
                                                 _overrides(args))
    source = T(src_hp, src_model, src_pipe, run_dir=args.source_run,
               log_every_n_steps=0)
    src_state, _ = source.restore(args.checkpoint or "best", trainset[0][1])

    merged = transfer_params(state.params, src_state.params,
                             skip_prefixes=tuple(args.skip or []))
    state = state.replace(params=merged)
    trainer.fit(events, max_epochs=args.max_epochs, state=state)


def _enable_compile_cache():
    """Persistent compile cache: axon remote compiles run 40-1000+ s, and a
    training run compiles several programs (train step, val forward, val
    loss, probes).  Without the cache every CLI invocation pays all of them
    again -- this is what starved the round-1 convergence runs."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main(argv=None):
    import os

    import jax

    p = argparse.ArgumentParser(prog="hierarchicalgnn_tpu.run")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("train", cmd_train), ("resume", cmd_resume),
                     ("test", cmd_test), ("transfer", cmd_transfer)):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--model", default="4",
                        help="model name or ID 1-5 (default: 4 = BC-HGNN-GMM)")
        sp.add_argument("--run-dir", default="runs/run")
        sp.add_argument("--input-dir", default=None)
        sp.add_argument("--max-epochs", type=int, default=None)
        sp.add_argument("--set", action="append", metavar="KEY=VALUE",
                        help="hparam overrides (sweep configs)")
        sp.add_argument("--log-every-n-steps", type=int, default=50)
        sp.add_argument("--synthetic-particles", type=int, default=120)
        # None (the default) means: resume tries last/autosave/best in
        # order; test/transfer use "best".  An explicit value always wins.
        sp.add_argument("--checkpoint", default=None)
        if name == "transfer":
            sp.add_argument("--source-run", required=True)
            sp.add_argument("--skip", action="append",
                            help="param path prefixes to keep from init")
    # Parse BEFORE taking the device lock (advisor r4): --help or a typo'd
    # subcommand must print usage immediately, not hang 6h behind an
    # active training run.
    args = p.parse_args(argv)

    # Effective platform: jax.config wins over the env var (tests force
    # CPU via jax.config; the pinned JAX_PLATFORMS=axon env would
    # otherwise make a CPU-only run queue behind a real chip user).
    platforms = jax.config.jax_platforms or os.environ.get(
        "JAX_PLATFORMS", "")
    if "cpu" not in str(platforms):
        # Single-tenant chip: serialize device users instead of racing a
        # concurrent run (the loser's stalls masquerade as tunnel flakes).
        from hierarchicalgnn_tpu.utils import device_lock
        device_lock.acquire(wait_s=6 * 3600.0, status=print)
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
