"""Per-workload training/eval step definitions.

Each pipeline bundles a model with its loss computation, mirroring the
reference LightningModule bases:

  * ``ECPipeline``         -- ``Modules/EdgeClassifier/edge_classifier_base.py``
  * ``EmbeddingPipeline``  -- ``Modules/GNNEmbedding/embedding_base.py``
  * ``BipartitePipeline``  -- ``Modules/BipartiteClassification/
                               bipartite_classification_base.py`` (also gMRT)

Pipelines are pure: ``loss(params, buffers, batch, epoch) -> (loss,
(new_buffers, metrics))`` and get jitted/grad-ed by the trainer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from hierarchicalgnn_tpu.data.event import Event
from hierarchicalgnn_tpu.ops.graph import Graph
from hierarchicalgnn_tpu.ops.intersect import edges_in_set
from hierarchicalgnn_tpu.ops.knn import knn_graph
from hierarchicalgnn_tpu.train import losses
from hierarchicalgnn_tpu.train.matching import match_particles_to_candidates

MUTABLE = ["buffers", "batch_stats"]


def _apply(model, params, buffers, batch: Event, training):
    variables = {"params": params, **buffers}
    if training:
        out, new_vars = model.apply(
            variables, batch.x, batch.graph, node_mask=batch.node_mask,
            training=True, mutable=MUTABLE)
        return out, dict(new_vars)
    out = model.apply(variables, batch.x, batch.graph,
                      node_mask=batch.node_mask, training=False)
    return out, buffers


class ECPipeline:
    """Edge classification: weighted BCE on edge scores.

    Truth handling per ``true_edges`` (reference
    ``edge_classifier_base.py:113-132``): with modulewise truth, neutral
    edges (PID-true but not modulewise-true) are dropped from the loss.
    """

    def __init__(self, model, hparams: dict):
        self.model = model
        self.hparams = hparams

    def loss(self, params, buffers, batch: Event, epoch, training=True):
        scores, new_buffers = _apply(self.model, params, buffers, batch,
                                     training)
        loss, metrics = self.loss_from_outputs(scores, batch, epoch)
        return loss, (new_buffers, metrics)

    def loss_from_outputs(self, scores, batch: Event, epoch,
                          matching_spmd=None):
        hp = self.hparams
        emask = batch.graph.edge_mask
        if hp["true_edges"] == "modulewise_true_edges":
            keep = emask & (jnp.logical_not(batch.y_pid) | batch.y)
            y = batch.y
        else:
            keep = emask
            y = batch.y_pid
        weights = losses.edge_pt_weights(
            batch.pt, batch.graph.senders, batch.graph.receivers,
            y, keep, hp)
        loss = losses.weighted_bce(scores, y, weights)
        return loss, {"training_loss": loss}


class EmbeddingPipeline:
    """Metric-learning embeddings with hinge loss on mined pairs.

    Sample mining (reference ``embedding_base.py:109-135``): kNN graph in
    embedding space at radius train_r, intersected with bidirectional
    signal truth; fake pairs filtered to different-PID.  The hierarchical
    variant adds an intermediate-embedding hinge loss mixed on the sine
    schedule (``:158-209``).
    """

    def __init__(self, model, hparams: dict, hierarchical: bool):
        self.model = model
        self.hparams = hparams
        self.hierarchical = hierarchical

    def _training_samples(self, embeddings, batch: Event):
        hp = self.hparams
        # predicted pairs: fixed-radius kNN in embedding space.  At full-
        # event scale (~1e5 hits) the quadratic brute force is replaced by
        # the cell-blocked grid search (ops/grid_knn.py; the reference's
        # FRNN grid regime, ``Modules/utils.py:228-239``) -- select with
        # ``knn_backend: grid``.  Its exactness certificate is surfaced as
        # the ``knn_exact`` metric (1.0 = provably identical to brute).
        self._knn_exact = None
        if hp.get("knn_backend", "brute") == "grid":
            from hierarchicalgnn_tpu.ops.grid_knn import grid_knn_graph

            n = embeddings.shape[0]
            ps, pr, pmask, _, exact = grid_knn_graph(
                embeddings, hp["train_r"], hp["knn"], mask=batch.node_mask,
                n_cells=int(hp.get("knn_grid_cells") or max(n // 256, 16)),
                n_probe=int(hp.get("knn_grid_probe", 16)))
            self._knn_exact = exact
        else:
            ps, pr, pmask, _ = knn_graph(
                embeddings, hp["train_r"], hp["knn"], mask=batch.node_mask,
                block_size=hp.get("knn_block_size", 1024))
        # bidirectional signal-masked truth
        tg = batch.true_graph
        ts = jnp.concatenate([tg.senders, tg.receivers])
        tr = jnp.concatenate([tg.receivers, tg.senders])
        tmask = jnp.concatenate([tg.edge_mask, tg.edge_mask])
        tmask = tmask & batch.signal_mask[ts] & batch.signal_mask[tr]

        if hp["true_edges"] == "modulewise_true_edges":
            y_pred = edges_in_set(ps, pr, pmask, ts, tr, tmask)
            # fake pairs: not in truth, different PID (or either is noise)
            pid_s, pid_r = batch.pid[ps], batch.pid[pr]
            fake = pmask & jnp.logical_not(y_pred) & (
                (pid_s != pid_r) | (pid_s == 0) | (pid_r == 0))
            s = jnp.concatenate([ps, ts])
            r = jnp.concatenate([pr, tr])
            mask = jnp.concatenate([fake, tmask])
            y = jnp.concatenate([jnp.zeros_like(fake), tmask])
        else:  # pid_true_edges (reference :127-134)
            s = jnp.concatenate([ps, ts])
            r = jnp.concatenate([pr, tr])
            mask = jnp.concatenate([pmask, tmask])
            pid_s, pid_r = batch.pid[s], batch.pid[r]
            y = (pid_s == pid_r) & (pid_s != 0) & (pid_r != 0) & mask
            sig = batch.signal_mask[s] & batch.signal_mask[r]
            # NOTE deliberate divergence: the reference's
            # ``mask = signal.all(0) | y == 0`` (embedding_base.py:131)
            # parses as ``(signal | y) == 0`` by operator precedence,
            # keeping only non-signal fake pairs.  We implement the evident
            # intent: keep fakes plus signal-masked true pairs.
            mask = mask & (sig | jnp.logical_not(y))
        return s, r, y & mask, mask

    def _hinge(self, embeddings, s, r, y, mask, batch: Event):
        hp = self.hparams
        weights = losses.edge_pt_weights(batch.pt, s, r, y, mask, hp)
        dist = losses.hinge_distances(embeddings, s, r)
        return losses.squared_hinge_loss(dist, y, weights, hp["train_r"])

    def loss(self, params, buffers, batch: Event, epoch, training=True):
        out, new_buffers = _apply(self.model, params, buffers, batch,
                                  training)
        loss, metrics = self.loss_from_outputs(out, batch, epoch)
        return loss, (new_buffers, metrics)

    def loss_from_outputs(self, out, batch: Event, epoch,
                          matching_spmd=None):
        hp = self.hparams
        metrics: dict[str, Any] = {}
        if self.hierarchical:
            embeddings, intermediate, aux = out
            g = batch.graph
            y_pid = ((batch.pid[g.senders] == batch.pid[g.receivers])
                     & g.edge_mask)
            intermediate_loss = self._hinge(
                intermediate, g.senders, g.receivers, y_pid, g.edge_mask, batch)
            s, r, y, mask = self._training_samples(embeddings, batch)
            emb_loss = self._hinge(embeddings, s, r, y, mask, batch)
            sched = losses.sine_loss_schedule(
                epoch, hp.get("intermediate_epoch", hp.get("emb_epoch", 1)),
                hp.get("loss_schedule"))
            loss = sched * intermediate_loss + (1 - sched) * emb_loss
            metrics.update(embedding_loss=emb_loss,
                           intermediate_loss=intermediate_loss,
                           score_cut=aux["score_cut"],
                           clusters=aux["n_clusters"])
        else:
            embeddings = out
            s, r, y, mask = self._training_samples(embeddings, batch)
            loss = self._hinge(embeddings, s, r, y, mask, batch)
        if self._knn_exact is not None:
            metrics["knn_exact"] = self._knn_exact.astype(jnp.float32)
        metrics["training_loss"] = loss
        return loss, metrics


class BipartitePipeline:
    """Bipartite classification: hinge embedding loss + matched-assignment
    BCE, mixed on the sine schedule (reference
    ``bipartite_classification_base.py:194-224``).  Used by BC and gMRT.
    """

    def __init__(self, model, hparams: dict):
        self.model = model
        self.hparams = hparams

    def loss(self, params, buffers, batch: Event, epoch, training=True):
        out, new_buffers = _apply(self.model, params, buffers, batch,
                                  training)
        loss, metrics = self.loss_from_outputs(out, batch, epoch)
        return loss, (new_buffers, metrics)

    def loss_from_outputs(self, out, batch: Event, epoch,
                          matching_spmd=None):
        hp = self.hparams
        bgraph, scores, intermediate, aux = out

        # embedding hinge loss on input edges, PID truth (reference :198-204)
        g = batch.graph
        y_pid = (batch.pid[g.senders] == batch.pid[g.receivers]) & g.edge_mask
        weights = losses.edge_pt_weights(
            batch.pt, g.senders, g.receivers, y_pid, g.edge_mask, hp)
        dist = losses.hinge_distances(intermediate, g.senders, g.receivers)
        emb_loss = losses.squared_hinge_loss(
            dist / hp["train_r"], y_pid, weights, margin=1.0)

        asgmt_loss = self._bipartite_loss(scores, bgraph, batch, aux,
                                          matching_spmd=matching_spmd)

        sched = losses.sine_loss_schedule(
            epoch, hp["emb_epoch"], hp.get("loss_schedule"))
        loss = sched * emb_loss + (1 - sched) * asgmt_loss
        metrics = {"training_loss": loss, "embedding_loss": emb_loss,
                   "assignment_loss": asgmt_loss,
                   "score_cut": aux["score_cut"],
                   "clusters": aux["n_clusters"]}
        return loss, metrics

    def _bipartite_loss(self, scores, bgraph: Graph, batch: Event, aux,
                        matching_spmd=None):
        """Assignment BCE against matching truth (reference :152-191)."""
        hp = self.hparams
        mesh, axis = matching_spmd if matching_spmd else (None, None)
        truth, row_match, col_match, match_valid = match_particles_to_candidates(
            jax.lax.stop_gradient(scores), bgraph.senders, bgraph.receivers,
            bgraph.edge_mask, batch.pid_compact, batch.particle_pid,
            batch.n_particles, aux["n_clusters"], hp["max_clusters"],
            backend=hp.get("matching_backend", "auction"),
            mesh=mesh, axis=axis,
            eps_scale=float(hp.get("matching_eps_scale", 1e-3)))

        # assignment weight: max(hit weight, matched-particle weight)
        # (reference get_asgmt_weight :123-138)
        c_max = hp["max_clusters"]
        supernode_pt = (jnp.zeros((c_max + 1,), jnp.float32)
                        .at[jnp.where(match_valid, col_match, c_max)]
                        .set(batch.particle_pt[row_match])[:c_max])
        w = jnp.maximum(
            losses.pt_weighting(batch.pt[bgraph.senders], hp),
            losses.pt_weighting(supernode_pt[bgraph.receivers], hp))
        w = losses.balance_weights(w, truth, bgraph.edge_mask,
                                   hp["log_weight_ratio"])
        return losses.weighted_bce(scores, truth, w)
