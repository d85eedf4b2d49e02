"""Track-candidate construction for evaluation, per pipeline.

Mirrors the reference ``shared_evaluation`` paths:
  * EC: score-cut the input edges -> connected components -> candidate
    labels (reference ``edge_classifier_base.py:156-165``), CC on device.
  * Embedding: HDBSCAN clustering of final embeddings (reference
    ``embedding_base.py:266-270``; cuML HDBSCAN -> sklearn HDBSCAN, host,
    eval-only).
  * BC/gMRT: bipartite graph filtered by score cut (reference
    ``bipartite_classification_base.py:262``).

All builders remap hit indices through ``inverse_mask`` so metrics are
computed against the unmodified event (reference ``:263-269``).
"""

from __future__ import annotations

import numpy as np

from hierarchicalgnn_tpu.ops.connected import cluster_labels


def ec_candidates(scores, batch, hparams):
    """Connected components over edges with score >= score_cut."""
    import jax.numpy as jnp

    g = batch.graph
    cut = hparams["score_cut"]
    above = g.edge_mask & (scores >= cut)
    # keep all edges if none pass the cut (reference :161-162)
    keep = jnp.where(jnp.any(above), above, g.edge_mask)
    n = batch.x.shape[0]
    clusters, _ = cluster_labels(g.senders, g.receivers, keep, n,
                                 min_cluster_size=1,
                                 node_mask=batch.node_mask)
    clusters = np.asarray(clusters)
    node_mask = np.asarray(batch.node_mask)
    inverse = np.asarray(batch.inverse_mask)
    sel = node_mask & (clusters >= 0)
    return np.stack([inverse[sel], clusters[sel]])


def embedding_candidates(embeddings, batch, hparams):
    """HDBSCAN spatial clustering of the embedding space (host)."""
    from sklearn.cluster import HDBSCAN

    node_mask = np.asarray(batch.node_mask)
    emb = np.asarray(embeddings)[node_mask]
    if len(emb) < hparams["inference_min_cluster_size"]:
        return np.zeros((2, 0), np.int64)
    clusterer = HDBSCAN(
        min_cluster_size=hparams["inference_min_cluster_size"],
        metric="euclidean", cluster_selection_method="eom")
    clusters = clusterer.fit_predict(emb.astype(np.float64))
    inverse = np.asarray(batch.inverse_mask)[node_mask]
    sel = clusters >= 0
    return np.stack([inverse[sel], clusters[sel]])


def bipartite_candidates(bgraph, scores, batch, hparams):
    """Bipartite hit->supernode assignments above the score cut."""
    emask = np.asarray(bgraph.edge_mask)
    scores = np.asarray(scores)
    senders = np.asarray(bgraph.senders)
    receivers = np.asarray(bgraph.receivers)
    sel = emask & (scores >= hparams["score_cut"])
    inverse = np.asarray(batch.inverse_mask)
    return np.stack([inverse[senders[sel]], receivers[sel]])
