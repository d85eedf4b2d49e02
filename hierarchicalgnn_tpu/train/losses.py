"""Loss functions and sample weighting.

Masked re-designs of the reference loss stack:
  * pT weighting curve (reference ``edge_classifier_base.py:82-97``)
  * positive/negative balancing (``:99-111``)
  * weighted BCE edge loss (``:113-132``)
  * squared hinge-embedding loss (``embedding_base.py:148-175``,
    ``bipartite_classification_base.py:140-204``)
  * sine loss schedule (``bipartite_classification_base.py:209-213``)

All functions take an explicit validity mask; padded entries carry zero
weight so every reduction matches the reference's dynamic-shape result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pt_weighting(pt, hparams):
    """w = w_min + (1-w_min)*clip((pt-cut)/(cap-cut), 0, 1) + leak*relu(pt-cap).

    heaviside(0) = 0 as in torch.heaviside with zero ``values``
    (reference ``edge_classifier_base.py:89``).
    """
    eps = hparams["weight_leak"]
    cap = hparams["ptcut"]
    cut = cap - hparams["pt_interval"]
    min_weight = hparams["weight_min"]
    pt = jnp.nan_to_num(pt)
    h_cut = (pt > cut).astype(pt.dtype)
    h_cap = (pt > cap).astype(pt.dtype)
    ramp = jnp.minimum(h_cut * (pt - cut) / (cap - cut), 1.0)
    return min_weight + (1 - min_weight) * ramp + eps * h_cap * (pt - cap)


def balance_weights(weights, y, mask, log_weight_ratio):
    """Normalize per-class weight mass, scaled by sigmoid(+/-lwr)
    (reference ``edge_classifier_base.py:104-111``)."""
    y = y & mask
    ny = jnp.logical_not(y) & mask
    true_total = jnp.maximum(jnp.sum(jnp.where(y, weights, 0.0)), 1e-12)
    fake_total = jnp.maximum(jnp.sum(jnp.where(ny, weights, 0.0)), 1e-12)
    lwr = jnp.asarray(log_weight_ratio, weights.dtype)
    w = jnp.where(y, weights / true_total * jax.nn.sigmoid(lwr), 0.0)
    w = w + jnp.where(ny, weights / fake_total * jax.nn.sigmoid(-lwr), 0.0)
    return w


def edge_pt_weights(pt, senders, receivers, y, mask, hparams):
    """Per-edge weight = sum of endpoint pT weights, then class-balanced."""
    w = pt_weighting(pt[senders], hparams) + pt_weighting(pt[receivers], hparams)
    return balance_weights(w, y, mask, hparams["log_weight_ratio"])


def weighted_bce(scores, targets, weights, eps: float = 1e-7):
    """dot(BCE(scores, targets), weights); weights are pre-masked."""
    s = jnp.clip(scores, eps, 1.0 - eps)
    t = targets.astype(s.dtype)
    bce = -(t * jnp.log(s) + (1.0 - t) * jnp.log(1.0 - s))
    return jnp.sum(bce * weights)


def squared_hinge_loss(dist, y, weights, margin):
    """dot(hinge_embedding_loss(dist, +/-1, margin)^2, weights).

    torch semantics: loss = dist for positives, relu(margin - dist) for
    negatives, then squared (reference ``embedding_base.py:167-175``).
    """
    pos = dist
    neg = jax.nn.relu(margin - dist)
    loss = jnp.where(y, pos, neg) ** 2
    return jnp.sum(loss * weights)


def hinge_distances(embeddings, senders, receivers, eps: float = 1e-12):
    """sqrt(||e_s - e_r||^2 + eps) per pair (reference ``:148-155``)."""
    d = embeddings[senders] - embeddings[receivers]
    return jnp.sqrt(jnp.sum(jnp.square(d), -1) + eps)


def sine_loss_schedule(epoch, schedule_epochs, override=None):
    """1 - sin(epoch * pi / (2 E)) for epoch < E else 0
    (reference ``bipartite_classification_base.py:209-213``)."""
    if override is not None:
        return jnp.asarray(override, jnp.float32)
    e = jnp.asarray(epoch, jnp.float32)
    E = jnp.asarray(schedule_epochs, jnp.float32)
    sched = 1.0 - jnp.sin(e / (2.0 * E) * jnp.pi)
    return jnp.where(e < E, sched, 0.0)
