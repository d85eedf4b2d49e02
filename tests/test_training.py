"""End-to-end training-step tests for each pipeline on tiny synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalgnn_tpu.data.synthetic import generate_dataset
from hierarchicalgnn_tpu.models.registry import model_selector
from hierarchicalgnn_tpu.train.trainer import Trainer

TINY = {
    "n_nodes_max": 512,
    "n_edges_max": 2048,
    "max_clusters": 128,
    "max_particles": 128,
    "latent": 16,
    "hidden_ratio": 2,
    "n_interaction_graph_iters": 2,
    "n_hierarchical_graph_iters": 2,
    "knn": 10,
    "knn_block_size": 256,
    "gmm_iters": 15,
    "train_split": [4, 2, 2],
    "warmup": 2,
    "max_epochs": 1,
    "use_pallas": False,  # mode pinned; interpret coverage is explicit below
    "compute_dtype": "float32",  # ditto: yaml default bf16 must not leak in
}


def make_trainer(name, tmp_path, **overrides):
    hparams, model, pipeline = model_selector(name, {**TINY, **overrides})
    events = generate_dataset(8, seed=1, n_particles=25)
    trainer = Trainer(hparams, model, pipeline, run_dir=str(tmp_path),
                      log_every_n_steps=0)
    return trainer, events


@pytest.mark.parametrize("name", ["EC-IN", "Embedding-IN", "BC-HGNN-GMM"])
def test_fit_one_epoch(name, tmp_path):
    trainer, events = make_trainer(name, tmp_path / name)
    state = trainer.fit(events, max_epochs=1, num_sanity_val_steps=1)
    assert int(state.step) == 4
    # params are finite after the update
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ec_loss_decreases(tmp_path):
    trainer, events = make_trainer("EC-IN", tmp_path,
                                   n_interaction_graph_iters=1, latent=16)
    trainset, valset, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    losses = []
    for _ in range(12):
        state, metrics = trainer._train_step(state, batch, 0)
        losses.append(float(metrics["training_loss"]))
    assert losses[-1] < losses[0], losses


def test_embedding_hgnn_step(tmp_path):
    trainer, events = make_trainer("Embedding-HGNN-GMM", tmp_path)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    state, metrics = trainer._train_step(state, batch, 0)
    assert np.isfinite(float(metrics["training_loss"]))
    # at init the GMM cut may trip the full-graph fallback -> few clusters
    assert float(metrics["clusters"]) >= 1


def test_gmrt_step(tmp_path):
    trainer, events = make_trainer("gMRT", tmp_path)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    state, metrics = trainer._train_step(state, batch, 0)
    assert np.isfinite(float(metrics["training_loss"]))


def test_buffers_update_during_training(tmp_path):
    trainer, events = make_trainer("BC-HGNN-GMM", tmp_path)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    b0 = jax.tree.map(np.asarray, state.buffers)
    _, batch = trainset[0]
    state, _ = trainer._train_step(state, batch, 0)
    b1 = jax.tree.map(np.asarray, state.buffers)
    changed = [not np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(b0), jax.tree.leaves(b1))]
    assert any(changed)  # score_cut / knn_radius / bn stats moved


def test_checkpoint_roundtrip(tmp_path):
    trainer, events = make_trainer("EC-IN", tmp_path)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    state, _ = trainer._train_step(state, batch, 0)
    trainer._save(state, "last", epoch=0)
    restored, epoch = trainer.restore("last", trainset[0][1])
    assert epoch == 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transfer_params():
    from hierarchicalgnn_tpu.train.checkpoint import transfer_params
    hp1, model1, _ = model_selector("BC-HGNN-GMM", TINY)
    hp2, model2, _ = model_selector("gMRT", TINY)
    events = generate_dataset(1, seed=2, n_particles=20)
    from hierarchicalgnn_tpu.data.event import preprocess_event
    ev = jax.tree.map(jnp.asarray, preprocess_event(events[0], hp1))
    v1 = model1.init(jax.random.key(0), ev.x, ev.graph,
                     node_mask=ev.node_mask, training=False)
    v2 = model2.init(jax.random.key(1), ev.x, ev.graph,
                     node_mask=ev.node_mask, training=False)
    merged = transfer_params(v2["params"], v1["params"])
    # The hierarchical-block params shared between BC and gMRT transferred;
    # gMRT's single-layer encoders (absent in BC) kept their init.
    flat_merged = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(merged)[0]}
    flat_src = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(v1["params"])[0]}
    shared = [k for k in flat_merged if k in flat_src
              and np.shape(flat_merged[k]) == np.shape(flat_src[k])]
    assert shared, "expected overlapping param paths"
    for k in shared:
        np.testing.assert_array_equal(np.asarray(flat_merged[k]),
                                      np.asarray(flat_src[k]))


def test_validate_produces_tracking_metrics(tmp_path):
    trainer, events = make_trainer("EC-IN", tmp_path)
    trainset, valset, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    metrics = trainer.validate(state, valset, epoch=0)
    for key in ("val_loss", "track_eff", "track_pur", "hit_eff", "hit_pur"):
        assert key in metrics
        assert np.isfinite(metrics[key])


def test_grad_accumulation_schedule(tmp_path):
    """k>1 accumulation runs and advances the optimizer step once per k
    batches (reference GradientAccumulationScheduler semantics)."""
    trainer, events = make_trainer("EC-IN", tmp_path,
                                   accumulate_grad_batches={0: 2})
    state = trainer.fit(events, max_epochs=1, num_sanity_val_steps=0)
    # 4 train events, k=2 -> 2 optimizer steps
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gmrt_phase_times_logged(tmp_path):
    trainer, events = make_trainer("gMRT", tmp_path)
    state = trainer.fit(events, max_epochs=1, num_sanity_val_steps=0)
    import json
    with open(str(tmp_path / "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    assert any("pooling_time" in r and "graph_construct_time" in r
               for r in records)


def test_inference_engine_roundtrip(tmp_path):
    """Train briefly, reload via InferenceEngine, reconstruct an event."""
    from hierarchicalgnn_tpu.inference import InferenceEngine
    trainer, events = make_trainer("EC-IN", tmp_path)
    trainer.fit(events, max_epochs=1, num_sanity_val_steps=0)
    engine = InferenceEngine.from_run(str(tmp_path), checkpoint="last")
    bipartite, metrics = engine.reconstruct(events[0], return_metrics=True)
    assert bipartite.shape[0] == 2
    assert set(metrics) == {"track_eff", "track_pur", "hit_eff", "hit_pur"}
    # hit indices refer to the raw event
    assert bipartite[0].max() < len(events[0]["pid"])


@pytest.mark.parametrize("name,truth", [
    ("EC-IN", "modulewise_true_edges"),
    ("EC-IN", "pid_true_edges"),
    ("Embedding-IN", "modulewise_true_edges"),
    ("Embedding-IN", "pid_true_edges"),
])
def test_truth_definitions(name, truth, tmp_path):
    """Both truth switches of the reference (edge_classifier_base.py:116-123,
    embedding_base.py:116-133) produce finite losses and updates."""
    trainer, events = make_trainer(name, tmp_path, true_edges=truth)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    state, metrics = trainer._train_step(state, batch, 0)
    assert np.isfinite(float(metrics["training_loss"]))


@pytest.mark.parametrize("name", ["EC-IN", "BC-HGNN-GMM"])
def test_train_step_pallas_interpret(name, tmp_path):
    """One training step with use_pallas=True (interpret mode on CPU):
    the sorted-native kernels' forward AND backward paths under grad."""
    trainer, events = make_trainer(name, tmp_path, use_pallas=True,
                                   latent=128, hidden_ratio=1)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    _, batch = trainset[0]
    state, metrics = trainer._train_step(state, batch, 0)
    assert np.isfinite(float(metrics["training_loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_fit_streaming_native_loader(tmp_path):
    """Streaming training from .hgnn files via the C++ prefetch loader."""
    from hierarchicalgnn_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("libhgnn_io.so not built")
    hparams, model, pipeline = model_selector("EC-IN", TINY)
    events = generate_dataset(6, seed=4, n_particles=20)
    paths = []
    for i, ev in enumerate(events[:4]):
        p = str(tmp_path / f"ev{i}.hgnn")
        nl.write_event(p, ev)
        paths.append(p)
    trainer = Trainer(hparams, model, pipeline,
                      run_dir=str(tmp_path / "run"), log_every_n_steps=0)
    state = trainer.fit_streaming(paths, val_events=events[4:],
                                  steps_per_epoch=4, max_epochs=2)
    assert int(state.step) == 8
    assert (tmp_path / "run" / "checkpoints" / "last").exists()


def test_numerics_sanitizer():
    """utils/sanitize.py: finite audit, determinism check, and the
    Trainer's debug_numerics step guard (the TPU-native sanitizer of
    SURVEY §5 -- the reference ships none)."""
    import pytest as _pytest

    from hierarchicalgnn_tpu.utils.sanitize import (
        assert_all_finite, check_determinism, finite_report)

    tree = {"a": np.ones(4, np.float32),
            "b": np.array([1.0, np.nan, np.inf, 2.0], np.float32),
            "ints": np.arange(3)}
    rep = finite_report(tree)
    assert list(rep) == ["['b']"] and rep["['b']"] == (2, 4)
    with _pytest.raises(FloatingPointError, match=r"\['b'\]: 2/4"):
        assert_all_finite(tree, "grads")
    assert_all_finite({"a": tree["a"]})

    # determinism: pure fn passes; a stateful fn is flagged
    check_determinism(lambda x: x * 2, jnp.arange(4.0), what="double")
    counter = {"n": 0}

    def impure(x):
        counter["n"] += 1
        return x + counter["n"]

    with _pytest.raises(AssertionError, match="nondeterministic"):
        check_determinism(impure, jnp.arange(4.0), what="impure")

    # Trainer guard: poisoned params -> first step raises with the audit
    # (and the fit loop's autosave fires before the exception propagates)
    hparams, model, pipeline = model_selector(
        "EC-IN", dict(TINY, debug_numerics=True))
    events = generate_dataset(4, seed=3, n_particles=10)
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/sanitize_t",
                      log_every_n_steps=0)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    bad_params = jax.tree.map(lambda p: p * np.nan, state.params)
    state = state.replace(params=bad_params)
    with _pytest.raises(FloatingPointError, match="non-finite training"):
        trainer.fit(events, max_epochs=1, state=state,
                    num_sanity_val_steps=0)
    import os
    assert os.path.exists("/tmp/sanitize_t/checkpoints/autosave")


def test_packed_step_compile_failure_falls_back():
    """Compiler-INTERNAL failures of the fused train step fall back to the
    split grad/apply programs and training proceeds (the Embedding-HGNN
    Pallas+bf16 fused program SIGSEGVs the TPU compiler in the wild --
    docs/DESIGN.md round 3)."""
    import jax.errors

    hparams, model, pipeline = model_selector("EC-IN", TINY)
    events = generate_dataset(4, seed=3, n_particles=10)
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/fallback_t",
                      log_every_n_steps=0)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()

    calls = {"n": 0}

    def boom(state, batch, epoch):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit signal SIGSEGV (11)")

    trainer._train_step_packed = boom
    new_state, metrics = trainer._train_step(state, trainset[0][1], 0)
    assert calls["n"] == 1 and trainer._packed_broken
    assert np.isfinite(metrics["training_loss"])
    # subsequent steps go straight to the split path (no second attempt)
    new_state, _ = trainer._train_step(new_state, trainset[1][1], 0)
    assert calls["n"] == 1
    assert int(new_state.step) == 2
    # non-INTERNAL runtime errors still propagate
    trainer2 = Trainer(hparams, model, pipeline, run_dir="/tmp/fallback_t2",
                       log_every_n_steps=0)
    trainer2.optimizer = trainer.optimizer
    trainer2._build_steps()

    def other(state, batch, epoch):
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: oom")

    trainer2._train_step_packed = other
    with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE"):
        trainer2._train_step(state, trainset[0][1], 0)


def test_force_split_step_config():
    """force_split_step (the Embedding-HGNN-GMM shipped default: its fused
    grad+update program SIGSEGVs the TPU compiler -- any fused param
    update after this loss's grad does, benchmarks/bisect_fused_r04.json)
    trains through the split two-program path from the first step, never
    attempting the packed program, with the same packed metric schema."""
    hparams, model, pipeline = model_selector(
        "EC-IN", {**TINY, "force_split_step": True})
    events = generate_dataset(4, seed=3, n_particles=10)
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/forcesplit_t",
                      log_every_n_steps=0)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    assert trainer._packed_broken
    calls = {"n": 0}

    def boom(*a):
        calls["n"] += 1
        raise AssertionError("packed step must not be attempted")

    trainer._train_step_packed = boom
    new_state, metrics = trainer._train_step(state, trainset[0][1], 0)
    assert calls["n"] == 0
    assert np.isfinite(metrics["training_loss"])
    assert "grad_norm" in metrics  # schema matches the packed step


def test_force_split_step_toolchain_canary():
    """force_split_step_env records the toolchain the compiler SIGSEGV was
    established under.  Same fingerprint -> stay split (never attempt the
    packed compile); changed fingerprint -> re-try the packed step once
    and clear the containment when it compiles (round-5 canary)."""
    from hierarchicalgnn_tpu.utils.env import toolchain_fingerprint

    live = toolchain_fingerprint()
    events = generate_dataset(4, seed=3, n_particles=10)

    # 1) fingerprint matches -> containment stays, packed never attempted
    hparams, model, pipeline = model_selector(
        "EC-IN", {**TINY, "force_split_step": True,
                  "force_split_step_env": dict(live)})
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/canary_same",
                      log_every_n_steps=0)
    trainset, _, _ = trainer.make_datasets(events)
    state = trainer.init_state(trainset[0][1])
    trainer._build_steps()
    assert trainer._packed_broken

    # 2) stale fingerprint -> one packed retry; it compiles here, so the
    # containment clears and training proceeds through the packed step
    stale = dict(live, jax="0.0.0-crashed-under")
    hparams2, model2, pipeline2 = model_selector(
        "EC-IN", {**TINY, "force_split_step": True,
                  "force_split_step_env": stale})
    trainer2 = Trainer(hparams2, model2, pipeline2,
                       run_dir="/tmp/canary_stale", log_every_n_steps=0)
    trainset2, _, _ = trainer2.make_datasets(events)
    state2 = trainer2.init_state(trainset2[0][1])
    trainer2._build_steps()
    assert not trainer2._packed_broken  # retry path engaged
    new_state, metrics = trainer2._train_step(state2, trainset2[0][1], 0)
    assert trainer2._packed_ok          # packed step compiled and ran
    assert np.isfinite(metrics["training_loss"])
