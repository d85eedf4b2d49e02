"""Training loop: the runner replacing PyTorch Lightning's Trainer.

Functionality parity with the reference runner (``Notebooks/script.py`` +
the Lightning bases):
  * deterministic dataset split: seed-42 path shuffle + seed-0 split
    (reference ``Modules/utils.py:24-25``, ``edge_classifier_base.py:36``)
  * jitted/donated train step (grad of the pipeline loss) with buffer
    (EMA/batch-norm) state threading
  * sanity validation steps before training (``num_sanity_val_steps=2``)
  * per-epoch validation with tracking metrics, epoch timing, JSONL logging
  * Orbax checkpointing: best-by-track_eff + last, resume, transfer
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from hierarchicalgnn_tpu.data.event import Event, preprocess_event
from hierarchicalgnn_tpu.evaluation import candidates as cand
from hierarchicalgnn_tpu.evaluation.tracking import DEFAULT_RESPONSE, eval_metrics
from hierarchicalgnn_tpu.train import checkpoint as ckpt_lib
from hierarchicalgnn_tpu.train.optim import make_optimizer
from hierarchicalgnn_tpu.train.pipelines import MUTABLE
from hierarchicalgnn_tpu.utils.logging import MetricLogger


class TrainState(struct.PyTreeNode):
    params: Any
    buffers: Any
    opt_state: Any
    step: jnp.ndarray


def split_dataset(events: Sequence, train_split: Sequence[int],
                  shuffle_seed: int = 42, split_seed: int = 0):
    """seed-42 shuffle then seed-0 permutation split (reference semantics)."""
    events = list(events)
    rng = np.random.default_rng(shuffle_seed)
    order = rng.permutation(len(events))
    events = [events[i] for i in order[: sum(train_split)]]
    rng2 = np.random.default_rng(split_seed)
    order2 = rng2.permutation(len(events))
    n_train, n_val, _ = train_split
    train = [events[i] for i in order2[:n_train]]
    val = [events[i] for i in order2[n_train:n_train + n_val]]
    test = [events[i] for i in order2[n_train + n_val:]]
    return train, val, test


class Trainer:
    def __init__(self, hparams: dict, model, pipeline, run_dir: str = "runs/run",
                 log_every_n_steps: int = 50):
        self.hparams = hparams
        self.model = model
        self.pipeline = pipeline
        self.run_dir = run_dir
        self.logger = MetricLogger(run_dir, log_every_n_steps,
                                   wandb_project=hparams.get("wandb_project"))
        self._train_step = None
        self._val_forward = None

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def make_datasets(self, raw_events: Sequence[dict]):
        """Preprocess raw events once; returns (train, val, test) lists of
        (raw, Event-on-device) pairs."""
        rng = np.random.default_rng(12345)
        processed = []
        for raw in raw_events:
            ev = preprocess_event(raw, self.hparams, rng=rng)
            processed.append((raw, jax.tree.map(jnp.asarray, ev)))
        return split_dataset(processed, self.hparams["train_split"])

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------
    def init_state(self, example: Event, seed: int = 0) -> TrainState:
        # jit the whole init: unjitted flax init executes the forward
        # eagerly op-by-op, and on the tunneled TPU every tiny op pays a
        # remote compile + ~30 ms RPC -- a cold-cache init took ~20 min
        # (what starved the round-1 convergence runs); jitted it is one
        # compile.
        init_fn = jax.jit(lambda key, x, graph, node_mask: self.model.init(
            key, x, graph, node_mask=node_mask, training=False))
        variables = dict(init_fn(jax.random.key(seed), example.x,
                                 example.graph, example.node_mask))
        params = variables.pop("params")
        buffers = {k: variables[k] for k in variables}
        self.optimizer = make_optimizer(self.hparams, self._steps_per_epoch())
        opt_state = jax.jit(self.optimizer.init)(params)
        return TrainState(params=params, buffers=buffers,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    def _steps_per_epoch(self) -> int:
        """Optimizer steps per epoch: with a data-axis mesh the fit loop
        consumes ``data`` events per step, so warmup/decay schedules must
        count ceil(n_train / data) steps -- not one per event -- to match
        single-device runs in epoch units."""
        n = max(self.hparams["train_split"][0], 1)
        mesh_shape = self.hparams.get("mesh_shape") or {}
        data_size = int(mesh_shape.get("data", 1) or 1)
        return max(-(-n // data_size), 1)

    def _build_steps(self):
        pipeline = self.pipeline
        optimizer = self.optimizer
        self._metric_names = None

        def pack_metrics(metrics):
            # One [K] f32 vector instead of K scalar outputs: the training
            # loop reads metrics back every step, and on the tunneled TPU
            # each scalar fetch is its own ~45 ms RPC -- 7 metrics cost
            # 320 ms/step, 24x the 13 ms step itself.  Packing makes the
            # whole step's telemetry a single readback.  Key order is
            # captured at trace time (static across steps).
            names = tuple(sorted(metrics))
            if self._metric_names is None:
                self._metric_names = names
            elif names != self._metric_names:
                # a retrace (e.g. size-bucket shape change) must produce the
                # same metric key set, or the dict(zip(...)) readback would
                # silently mislabel values
                raise RuntimeError(
                    f"metric key set changed across traces: "
                    f"{self._metric_names} -> {names}")
            return jnp.stack([jnp.asarray(metrics[k], jnp.float32).reshape(())
                              for k in names])

        def train_step(state: TrainState, batch: Event, epoch):
            def loss_fn(params):
                loss, (new_buffers, metrics) = pipeline.loss(
                    params, state.buffers, batch, epoch, training=True)
                return loss, (new_buffers, metrics)

            (loss, (new_buffers, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(
                params=new_params, buffers=new_buffers,
                opt_state=new_opt_state, step=state.step + 1)
            metrics = dict(metrics)
            metrics["grad_norm"] = jnp.sqrt(sum(
                jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
            return new_state, pack_metrics(metrics)

        self._train_step_packed = jax.jit(train_step, donate_argnums=(0,))

        debug_numerics = bool(self.hparams.get("debug_numerics"))
        # force_split_step: skip the packed grad+update program entirely.
        # The Embedding-HGNN-GMM pipeline's fused program SIGSEGVs the TPU
        # compiler -- bisected to "value_and_grad of this loss + ANY fused
        # param update, even p - lr*g" (benchmarks/bisect_fused_r04.json;
        # grad alone compiles) -- so its shipped config opts into the split
        # two-program form up front instead of paying the doomed ~1-3 min
        # compile before falling back.
        self._packed_broken = bool(self.hparams.get("force_split_step"))
        self._packed_ok = False   # has the packed step ever completed?
        # Toolchain canary (round-5): force_split_step ships with the
        # fingerprint of the toolchain the SIGSEGV was established under
        # (force_split_step_env).  If the live toolchain differs, re-try
        # the packed compile ONCE -- the first-call INTERNAL-error fallback
        # below contains a still-broken compiler, so the worst case is one
        # doomed ~1-3 min compile per toolchain change, and the 1-program
        # form is not disabled forever once upstream fixes it.  The
        # standalone repro artifact for upstream lives at
        # benchmarks/repro_fused_sigsegv.stablehlo.bin
        # (scripts/export_fused_repro.py).
        crash_env = self.hparams.get("force_split_step_env")
        if self._packed_broken and crash_env:
            from hierarchicalgnn_tpu.utils.env import toolchain_fingerprint
            live = toolchain_fingerprint()
            if {k: crash_env.get(k) for k in live} != live:
                print("force_split_step: toolchain fingerprint changed "
                      f"({crash_env} -> {live}); re-trying the packed "
                      "train-step compile once", flush=True)
                self._packed_broken = False
                self._canary_retry = True

        def _split_step(state, batch, epoch):
            """Two-program fallback (same code as the accumulation path).
            Metrics arrive packed: the r3 fallback's per-metric float()
            readbacks (~45 ms RPC each over the tunnel) were most of its
            1.85x penalty, not the extra dispatch."""
            grads, buffers, vec = self._grad_step(state, batch, epoch)
            new_state = self._apply_grads(state, grads, buffers)
            vals = np.asarray(vec)
            return new_state, dict(zip(self._metric_names, vals.tolist()))

        def _train_step_dict(state, batch, epoch):
            if self._packed_broken:
                return _split_step(state, batch, epoch)
            try:
                new_state, vec = self._train_step_packed(state, batch, epoch)
                vals = np.asarray(vec)  # single readback
            except jax.errors.JaxRuntimeError as e:
                # Compiler-internal failures (observed: the remote TPU
                # compile helper SIGSEGVs on the Embedding-HGNN fused
                # grad+optimizer program) -- contain by splitting the step
                # into the grad/apply two-program form, which compiles.
                # Inputs are not consumed on a failed compile, so state is
                # still live for the retry.  Only the FIRST call may fall
                # back: once a packed step has completed, an INTERNAL error
                # is an execution failure after the donated input buffers
                # were consumed -- retrying on deleted arrays would raise a
                # confusing secondary error masking the original.
                if "INTERNAL" not in str(e) or self._packed_ok:
                    raise
                print(f"packed train step failed to compile ({str(e)[:120]}"
                      "...); falling back to split grad/apply programs",
                      flush=True)
                self._packed_broken = True
                return _split_step(state, batch, epoch)
            if not self._packed_ok and getattr(self, "_canary_retry", False):
                print("force_split_step canary: the packed train step now "
                      "compiles under the new toolchain; split-step "
                      "containment cleared for this run", flush=True)
            self._packed_ok = True
            metrics = dict(zip(self._metric_names, vals.tolist()))
            if debug_numerics and not np.isfinite(vals).all():
                # numerics sanitizer (utils/sanitize.py): fail LOUDLY at the
                # first poisoned step with the exact bad leaves; the
                # fit-loop's autosave-on-exception still checkpoints.
                from hierarchicalgnn_tpu.utils.sanitize import finite_report
                report = {"metrics": {k: v for k, v in metrics.items()
                                      if not np.isfinite(v)},
                          "params": finite_report(new_state.params,
                                                  max_leaves=8),
                          "buffers": finite_report(new_state.buffers,
                                                   max_leaves=8)}
                # autosave HERE: the input state was donated to the step,
                # so the fit loop's exception handler cannot save it
                self._save(new_state, "autosave",
                           epoch=getattr(self, "_cur_epoch", epoch))
                raise FloatingPointError(
                    f"non-finite training step (epoch {epoch}): {report}")
            return new_state, metrics

        self._train_step = _train_step_dict

        # Graph-partitioned training: when the config names a mesh with a
        # graph axis, the train step runs the production model under the
        # explicit shard_map halo schedule (parallel/graph_shard.py) --
        # same params/buffers/checkpoints as the single-device path.
        mesh_shape = self.hparams.get("mesh_shape")
        if mesh_shape and int(mesh_shape.get("graph", 1)) > 1:
            from hierarchicalgnn_tpu.parallel.graph_shard import (
                make_sharded_train_step)
            from hierarchicalgnn_tpu.parallel.mesh import make_mesh
            from hierarchicalgnn_tpu.parallel.step import stack_events

            mesh = make_mesh(**{k: int(v) for k, v in mesh_shape.items()})
            sharded = make_sharded_train_step(pipeline, optimizer, mesh,
                                              self.hparams)
            # data axis > 1: the fit loop groups that many events per step
            # (micro-batch DP on top of the graph partition)
            data_size = int(mesh_shape.get("data", 1))
            self._step_batch = data_size

            def _sharded_step_dict(state, batch, epoch):
                if data_size == 1:  # fit loop passes a single Event
                    batch = stack_events([batch])
                new_state, metrics = sharded(state, batch, epoch)
                return new_state, {k: float(v) for k, v in metrics.items()}

            self._train_step = _sharded_step_dict

        # --- gradient accumulation path (reference resume uses a
        # GradientAccumulationScheduler {0:1, 4:2, 8:4},
        # Notebooks/script.py:48) ---
        def grad_step(state: TrainState, batch: Event, epoch):
            def loss_fn(params):
                loss, (new_buffers, metrics) = pipeline.loss(
                    params, state.buffers, batch, epoch, training=True)
                return loss, (new_buffers, metrics)

            (_, (new_buffers, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # same metric key set as the packed step: a mid-run fallback to
            # the split form must not change the logged schema; packed into
            # one [K] vector for a single readback (see pack_metrics)
            metrics = dict(metrics)
            metrics["grad_norm"] = jnp.sqrt(sum(
                jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
            return grads, new_buffers, pack_metrics(metrics)

        self._grad_step = jax.jit(grad_step)

        def apply_grads(state: TrainState, grads, new_buffers):
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            return TrainState(params=new_params, buffers=new_buffers,
                              opt_state=new_opt_state, step=state.step + 1)

        self._apply_grads = jax.jit(apply_grads, donate_argnums=(0,))

        def val_forward(state: TrainState, batch: Event):
            variables = {"params": state.params, **state.buffers}
            return self.model.apply(variables, batch.x, batch.graph,
                                    node_mask=batch.node_mask, training=False)

        self._val_forward = jax.jit(val_forward)

        def val_loss(state: TrainState, batch: Event, epoch):
            loss, (_, metrics) = pipeline.loss(
                state.params, state.buffers, batch, epoch, training=False)
            return loss, metrics

        self._val_loss = jax.jit(val_loss)

        def val_forward_and_loss(state: TrainState, batch: Event, epoch):
            out = val_forward(state, batch)
            loss, metrics = pipeline.loss_from_outputs(out, batch, epoch)
            return out, loss, metrics

        self._val_forward_and_loss = jax.jit(val_forward_and_loss)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def evaluate_event(self, state: TrainState, raw: dict, batch: Event,
                       out=None):
        """Track metrics against the unmodified raw event (reference
        ``shared_evaluation``)."""
        hp = self.hparams
        if out is None:
            out = self._val_forward(state, batch)
        name = hp["model"]
        if name == "EC-IN":
            bipartite = cand.ec_candidates(out, batch, hp)
        elif name in ("Embedding-IN", "Embedding-HGNN-GMM"):
            emb = out if name == "Embedding-IN" else out[0]
            bipartite = cand.embedding_candidates(emb, batch, hp)
        else:  # BC / gMRT
            bgraph, scores = out[0], out[1]
            bipartite = cand.bipartite_candidates(bgraph, scores, batch, hp)

        pid = np.asarray(raw["pid"])
        pt = np.asarray(raw["pt"]).copy()
        pt[pid == 0] = 0.0
        try:
            return eval_metrics(
                bipartite, pid, pt, primary=raw.get("primary"),
                pt_cut=hp["ptcut"], nhits_cut=hp["n_hits"],
                majority_cut=hp["majority_cut"], use_primary=False)
        except Exception:
            # zero-metrics fallback (the reference bare-excepts here too,
            # embedding_base.py:279-287) -- but log it so real eval bugs
            # don't vanish silently
            import traceback
            print("evaluate_event failed, returning zero metrics:",
                  flush=True)
            traceback.print_exc()
            return dict(DEFAULT_RESPONSE)

    def validate(self, state: TrainState, valset, epoch: int):
        """One forward per event: loss and track candidates share outputs."""
        agg: dict[str, list] = {}
        for raw, batch in valset:
            out, loss, _ = self._val_forward_and_loss(state, batch, epoch)
            tracking = self.evaluate_event(state, raw, batch, out=out)
            rec = {"val_loss": float(loss), **tracking}
            for k, v in rec.items():
                agg.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------
    def fit(self, raw_events: Sequence[dict], max_epochs: int | None = None,
            state: TrainState | None = None, start_epoch: int = 0,
            num_sanity_val_steps: int = 2, shuffle_seed: int = 0):
        hp = self.hparams
        max_epochs = max_epochs or hp["max_epochs"]
        trainset, valset, testset = self.make_datasets(raw_events)
        if state is None:
            # init_seed: parameter-init seed (seed studies, e.g. the
            # f32-islands ablation); data split/shuffle seeds stay fixed
            # so runs differ only in initialization.
            state = self.init_state(trainset[0][1],
                                    seed=int(hp.get("init_seed") or 0))
        else:
            self.optimizer = make_optimizer(hp, self._steps_per_epoch())
        self._build_steps()

        if num_sanity_val_steps:
            sanity = self.validate(state, valset[:num_sanity_val_steps], 0)
            self.logger.log(sanity, step=0, epoch=-1, prefix="sanity_",
                            force_print=True)

        accum = hp.get("accumulate_grad_batches") or 1

        def accum_for_epoch(epoch):
            if isinstance(accum, dict):
                ks = [k for k in sorted(int(k) for k in accum) if k <= epoch]
                return int(accum[ks[-1]] if ks else 1)
            return int(accum)

        rng = np.random.default_rng(shuffle_seed)
        best_track_eff = -1.0
        self._cur_epoch = start_epoch
        try:
            state, best_track_eff = self._fit_epochs(
                state, trainset, valset, rng, start_epoch, max_epochs,
                accum_for_epoch, best_track_eff)
        except KeyboardInterrupt:
            # failure containment: persist an emergency checkpoint so the
            # run is resumable (the reference relies on Lightning's
            # last.ckpt).  _cur_epoch tracks the epoch actually in flight so
            # the resume does not replay already-trained epochs.
            self._autosave_safe(state)
            raise
        except Exception:
            self._autosave_safe(state)
            raise
        return state

    def _autosave_safe(self, state):
        """Autosave that never masks the original exception: the state may
        hold donated (deleted) arrays when a step raised mid-flight (the
        debug_numerics guard already saved the post-step state itself)."""
        try:
            self._save(state, "autosave", epoch=self._cur_epoch)
        except Exception:
            import traceback
            print("autosave-on-exception failed (continuing to re-raise "
                  "the original error):", flush=True)
            traceback.print_exc()

    def _fit_epochs(self, state, trainset, valset, rng, start_epoch,
                    max_epochs, accum_for_epoch, best_track_eff):
        # host-side step counter: int(state.step) per step is a blocking
        # device readback (a full RPC round trip on the tunneled TPU)
        step_i = int(state.step)
        save_every = int(self.hparams.get("save_every_n_epochs") or 1)
        for epoch in range(start_epoch, max_epochs):
            self._cur_epoch = epoch
            t0 = time.time()
            order = rng.permutation(len(trainset))
            k = accum_for_epoch(epoch)
            bs = int(getattr(self, "_step_batch", 1) or 1)
            if k <= 1 and bs > 1:
                # combined data x graph mesh: each step consumes `bs` events
                # stacked over the data axis; a ragged tail repeats the last
                # event (its gradient is averaged in twice -- same slight
                # oversampling a drop_last=False DP loader has)
                from hierarchicalgnn_tpu.parallel.step import stack_events
                idxs = list(order)
                for j in range(0, len(idxs), bs):
                    events = [trainset[i][1] for i in idxs[j:j + bs]]
                    while len(events) < bs:
                        events.append(events[-1])
                    state, metrics = self._train_step(
                        state, stack_events(events), epoch)
                    step_i += 1
                    self.logger.log(metrics, step=step_i, epoch=epoch)
            elif k <= 1:
                for i in order:
                    _, batch = trainset[i]
                    state, metrics = self._train_step(state, batch, epoch)
                    step_i += 1
                    self.logger.log(metrics, step=step_i, epoch=epoch)
            else:
                if bs > 1:
                    # the accumulation path trains through the unsharded
                    # _grad_step -- silently bypassing a data-axis mesh
                    raise ValueError(
                        "accumulate_grad_batches>1 is not supported with "
                        "mesh_shape.data>1 (the accumulation path would "
                        "bypass the data-sharded step)")
                acc = None
                since = 0
                for i in order:
                    _, batch = trainset[i]
                    grads, buffers, vec = self._grad_step(state, batch,
                                                          epoch)
                    state = state.replace(buffers=buffers)
                    acc = grads if acc is None else jax.tree.map(
                        jnp.add, acc, grads)
                    since += 1
                    if since == k:
                        avg = jax.tree.map(lambda g: g / k, acc)
                        state = self._apply_grads(state, avg, state.buffers)
                        acc, since = None, 0
                        step_i += 1
                        metrics = dict(zip(self._metric_names,
                                           np.asarray(vec).tolist()))
                        self.logger.log(metrics, step=step_i, epoch=epoch)
                if since:  # flush the ragged tail
                    avg = jax.tree.map(lambda g: g / since, acc)
                    state = self._apply_grads(state, avg, state.buffers)
                    step_i += 1
            epoch_time = time.time() - t0

            val_metrics = self.validate(state, valset, epoch)
            val_metrics["epoch_time"] = epoch_time
            try:
                val_metrics.update(self._phase_times(state, valset))
            except Exception:
                # phase probes are diagnostics -- a probe compile/run
                # failure must not kill the training run
                import traceback
                print("phase-time probes failed (continuing):", flush=True)
                traceback.print_exc()
            self.logger.log(val_metrics, step=step_i, epoch=epoch,
                            force_print=True)

            # checkpointing is a full-state device->host fetch (~20 s over
            # the tunnel); save_every_n_epochs trades resume granularity
            # for epoch throughput.  The final epoch always saves.
            if (epoch + 1 - start_epoch) % save_every == 0 \
                    or epoch == max_epochs - 1:
                self._save(state, "last", epoch)
            if val_metrics.get("track_eff", 0.0) >= best_track_eff:
                best_track_eff = val_metrics.get("track_eff", 0.0)
                self._save(state, "best", epoch)
        return state, best_track_eff

    def _phase_times(self, state: TrainState, valset) -> dict:
        """gMRT-style pooling/graph-construction epoch timing (reference
        ``gmrt_base.py:61-73``); on by default for gMRT, opt-in via
        ``log_phase_times`` for the other hierarchical pipelines."""
        hp = self.hparams
        enabled = hp.get("log_phase_times", hp.get("model") == "gMRT")
        if not enabled or not valset:
            return {}
        if not hasattr(self, "_probes"):
            from hierarchicalgnn_tpu.utils.phase_probe import PhaseProbes
            self._probes = PhaseProbes(hp)
        from hierarchicalgnn_tpu.ops.graph import bidirectionalize
        _, batch = valset[0]
        out = self._val_forward(state, batch)
        emb = out[2] if isinstance(out, tuple) else out
        return self._probes.measure(emb, bidirectionalize(batch.graph),
                                    batch.node_mask)

    def fit_streaming(self, train_paths: Sequence[str], val_events,
                      steps_per_epoch: int, max_epochs: int | None = None,
                      state: TrainState | None = None,
                      n_threads: int = 4, queue_capacity: int = 8,
                      shuffle_seed: int = 0):
        """Train from the native prefetching loader instead of preloaded
        events -- the large-dataset path (the reference streams every event
        from disk through 16 dataloader workers each epoch).

        ``val_events``: list of raw event dicts for validation (small).
        """
        from hierarchicalgnn_tpu.data.native_loader import NativeEventLoader

        hp = self.hparams
        max_epochs = max_epochs or hp["max_epochs"]
        rng = np.random.default_rng(12345)
        valset = [(raw, jax.tree.map(jnp.asarray,
                                     preprocess_event(raw, hp, rng=rng)))
                  for raw in val_events]

        loader = NativeEventLoader(list(train_paths), loop=True,
                                   n_threads=n_threads,
                                   queue_capacity=queue_capacity,
                                   shuffle_seed=shuffle_seed)
        try:
            if state is None:
                first = preprocess_event(next(loader), hp, rng=rng)
                state = self.init_state(jax.tree.map(jnp.asarray, first))
            self._build_steps()
            # data-axis mesh: each sharded step consumes `bs` stacked events
            # (same contract as the fit loop's micro-batch path)
            bs = int(getattr(self, "_step_batch", 1) or 1)
            if bs > 1:
                from hierarchicalgnn_tpu.parallel.step import stack_events
            best = -1.0
            step_i = int(state.step)
            for epoch in range(max_epochs):
                t0 = time.time()
                for _ in range(steps_per_epoch):
                    if bs == 1:
                        batch = jax.tree.map(
                            jnp.asarray,
                            preprocess_event(next(loader), hp, rng=rng))
                    else:
                        batch = stack_events([
                            jax.tree.map(jnp.asarray, preprocess_event(
                                next(loader), hp, rng=rng))
                            for _ in range(bs)])
                    state, metrics = self._train_step(state, batch, epoch)
                    step_i += 1
                    self.logger.log(metrics, step=step_i, epoch=epoch)
                val_metrics = self.validate(state, valset, epoch)
                val_metrics["epoch_time"] = time.time() - t0
                self.logger.log(val_metrics, step=step_i,
                                epoch=epoch, force_print=True)
                self._save(state, "last", epoch)
                if val_metrics.get("track_eff", 0.0) >= best:
                    best = val_metrics.get("track_eff", 0.0)
                    self._save(state, "best", epoch)
        finally:
            loader.close()
        return state

    def test(self, state: TrainState, raw_events: Sequence[dict]):
        _, _, testset = self.make_datasets(raw_events)
        if self._val_forward is None:
            self.optimizer = make_optimizer(self.hparams,
                                            self._steps_per_epoch())
            self._build_steps()
        metrics = self.validate(state, testset, epoch=10 ** 9)
        self.logger.log(metrics, step=-1, prefix="test_", force_print=True)
        return metrics

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def _state_dict(self, state: TrainState, epoch: int):
        return {"params": state.params, "buffers": state.buffers,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step),
                "epoch": np.asarray(epoch, np.int32)}

    def _save(self, state: TrainState, name: str, epoch: int):
        ckpt_lib.save_checkpoint(self.run_dir, name,
                                 self._state_dict(state, epoch), self.hparams)

    def restore(self, name: str, example: Event) -> tuple[TrainState, int]:
        template = self.init_state(example)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            self._state_dict(template, 0))
        restored = ckpt_lib.restore_checkpoint(self.run_dir, name, abstract)
        # Orbax hands back host arrays; push them to device ONCE.  Left as
        # numpy, every subsequent jitted step re-uploads the full state
        # (measured 7.4 -> 95 s/epoch after a resume on the tunneled TPU).
        state = jax.device_put(
            TrainState(params=restored["params"],
                       buffers=restored["buffers"],
                       opt_state=restored["opt_state"],
                       step=jnp.asarray(restored["step"])))
        return state, int(restored["epoch"])
