"""Inference / serving: raw event -> track candidates.

The reference has no dedicated inference path (track building happens
inside Lightning validation steps).  For deployment this module packages
the full reconstruction as a reusable engine: one jitted forward per
model + the pipeline-specific candidate builder, loadable straight from a
training run directory.

    engine = InferenceEngine.from_run("runs/bc")
    tracks = engine.reconstruct(raw_event)   # [2, M] (hit, track) pairs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hierarchicalgnn_tpu.data.event import preprocess_event
from hierarchicalgnn_tpu.evaluation import candidates as cand
from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics
from hierarchicalgnn_tpu.models.registry import model_selector
from hierarchicalgnn_tpu.train import checkpoint as ckpt_lib


class InferenceEngine:
    def __init__(self, hparams: dict, model, params, buffers):
        self.hparams = hparams
        self.model = model
        self.variables = {"params": params, **buffers}

        def forward(variables, x, graph, node_mask):
            return model.apply(variables, x, graph, node_mask=node_mask,
                               training=False)

        self._forward = jax.jit(forward)

    # ------------------------------------------------------------------
    @staticmethod
    def from_run(run_dir: str, checkpoint: str = "best",
                 sweep_configs: dict | None = None) -> "InferenceEngine":
        """Load a trained model from a run directory (hparams + orbax)."""
        from hierarchicalgnn_tpu.data.synthetic import generate_event
        from hierarchicalgnn_tpu.train.trainer import Trainer

        saved = ckpt_lib.load_hparams(run_dir)
        hparams, model, pipeline = model_selector(
            saved["model"], {**saved, **(sweep_configs or {})})
        trainer = Trainer(hparams, model, pipeline, run_dir=run_dir,
                          log_every_n_steps=0)
        raw = generate_event(np.random.default_rng(0), n_particles=10)
        template = jax.tree.map(jnp.asarray, preprocess_event(raw, hparams))
        state, _ = trainer.restore(checkpoint, template)
        return InferenceEngine(hparams, model, state.params, state.buffers)

    # ------------------------------------------------------------------
    def reconstruct(self, raw_event: dict, return_metrics: bool = False):
        """Full reconstruction of one raw event.

        Returns the bipartite (hit, track) assignment in *original* event
        hit indices; optionally tracking metrics vs the event's truth.
        """
        hp = self.hparams
        batch = jax.tree.map(jnp.asarray, preprocess_event(raw_event, hp,
                                                           stage="test"))
        out = self._forward(self.variables, batch.x, batch.graph,
                            batch.node_mask)
        name = hp["model"]
        if name == "EC-IN":
            bipartite = cand.ec_candidates(out, batch, hp)
        elif name in ("Embedding-IN", "Embedding-HGNN-GMM"):
            emb = out if name == "Embedding-IN" else out[0]
            bipartite = cand.embedding_candidates(emb, batch, hp)
        else:
            bipartite = cand.bipartite_candidates(out[0], out[1], batch, hp)

        if not return_metrics:
            return bipartite
        pid = np.asarray(raw_event["pid"])
        pt = np.asarray(raw_event["pt"]).copy()
        pt[pid == 0] = 0.0
        metrics = eval_metrics(bipartite, pid, pt,
                               primary=raw_event.get("primary"),
                               pt_cut=hp["ptcut"], nhits_cut=hp["n_hits"],
                               majority_cut=hp["majority_cut"])
        return bipartite, metrics
