"""SDDMM-style per-edge products.

The reference computes per-edge dot products of endpoint embeddings with
``torch.einsum('ij,ij->i', emb[graph[0]], emb[graph[1]])`` (reference
``Modules/gnn_utils.py:208``, ``Modules/BipartiteClassification/Models/
HGNN_GMM.py:188``).  On TPU this is a sampled dense-dense matmul: gather the
two endpoint rows and contract the feature axis on the VPU (feature dims here
are small: emb_dim=8..latent=256, so the gather dominates and XLA fuses the
multiply-reduce into it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_dot(src_features, dst_features, senders, receivers, mask=None):
    """Per-edge <src_row, dst_row> products. Padded edges -> 0."""
    out = jnp.sum(src_features[senders] * dst_features[receivers], axis=-1)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


@jax.custom_vjp
def edge_dot_from_knn(src_features, dst_features, senders, receivers, mask,
                      d2):
    """Per-edge <src_row, dst_row> recovered from the kNN's own distance
    byproduct -- zero forward gathers.

    The blockwise-MXU kNN (:mod:`ops.knn`) computes every candidate dot on
    the MXU to rank neighbors and returns the squared distance d2 =
    |s|^2 + |d|^2 - 2<s,d> of each selected edge; so the logits the
    reference recomputes with a gathered einsum
    (``Modules/gnn_utils.py:208``) are pure algebra here:
    <s,d> = (|s|^2 + |d|^2 - d2)/2 -- two [E] scalar gathers instead of two
    [E, latent] row gathers.  ``d2`` must be the (stop-gradient) kNN output
    for exactly these edges; the custom VJP supplies the true dot gradient
    (d_src[s] += g * dst[r], d_dst[r] += g * src[s]), so gradients match
    :func:`edge_dot` while the forward row traffic disappears.
    """
    out, _ = _edot_knn_fwd(src_features, dst_features, senders, receivers,
                           mask, d2)
    return out


def _edot_knn_fwd(src, dst, senders, receivers, mask, d2):
    sqn_s = jnp.sum(jnp.square(src.astype(jnp.float32)), axis=-1)
    sqn_d = jnp.sum(jnp.square(dst.astype(jnp.float32)), axis=-1)
    out = 0.5 * (sqn_s[senders] + sqn_d[receivers] - d2)
    out = jnp.where(mask, out, 0.0)
    return out, (src, dst, senders, receivers, mask)


def _edot_knn_bwd(residuals, g):
    src, dst, senders, receivers, mask = residuals
    g = jnp.where(mask, g, 0.0)
    d_src = (jnp.zeros(src.shape, jnp.float32)
             .at[senders].add(g[:, None] * dst.astype(jnp.float32)[receivers])
             ).astype(src.dtype)
    d_dst = (jnp.zeros(dst.shape, jnp.float32)
             .at[receivers].add(g[:, None] * src.astype(jnp.float32)[senders])
             ).astype(dst.dtype)
    return d_src, d_dst, None, None, None, None


edge_dot_from_knn.defvjp(_edot_knn_fwd, _edot_knn_bwd)


def edge_squared_distance(src_features, dst_features, senders, receivers,
                          mask=None, eps: float = 0.0):
    """Per-edge squared Euclidean distance (+eps), masked to 0."""
    d = src_features[senders] - dst_features[receivers]
    out = jnp.sum(jnp.square(d), axis=-1) + eps
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def edge_distance(src_features, dst_features, senders, receivers, mask=None,
                  eps: float = 1e-12):
    """sqrt(||src - dst||^2 + eps): hinge-loss distance (reference
    ``Modules/BipartiteClassification/bipartite_classification_base.py:148``)."""
    sq = edge_squared_distance(src_features, dst_features, senders, receivers,
                               mask=None, eps=eps)
    out = jnp.sqrt(sq)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def normalize_unit_f32(embeddings):
    """f32 unit rows with a zero-safe vjp (see edge_cosine_likelihood)."""
    emb = embeddings.astype(jnp.float32)
    sq = jnp.sum(jnp.square(emb), axis=-1, keepdims=True)
    return emb * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


def cosine_from_endpoints(x_s, x_r, mask=None, clamp: float = 1e-7):
    """atanh(clamped <x_s, x_r>) from already-gathered unit endpoint rows.

    The kernel-backed half of the GMM edge likelihood (reference
    ``Modules/BipartiteClassification/Models/HGNN_GMM.py:188-189``): in
    sorted-native mode the [E, d] endpoint rows come from the blocked-CSR
    one-hot MXU gather (``ops.pallas.sorted_agg.gather_edge_endpoints``)
    instead of XLA's serial dynamic-slice row gather -- the dot itself is
    a fused VPU multiply-reduce.  Inputs must be f32 unit rows
    (:func:`normalize_unit_f32`); see :func:`edge_cosine_likelihood` for
    why this stays an f32 island on the bf16 data path.
    """
    cos = jnp.sum(x_s.astype(jnp.float32) * x_r.astype(jnp.float32), axis=-1)
    cos = jnp.clip(cos, -1.0 + clamp, 1.0 - clamp)
    out = jnp.arctanh(cos)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def edge_cosine_likelihood(embeddings, senders, receivers, mask=None,
                           clamp: float = 1e-7):
    """atanh(clamped cosine similarity) of unit embeddings per edge.

    The GMM clustering edge likelihood (reference
    ``Modules/BipartiteClassification/Models/HGNN_GMM.py:188-189``).
    Assumes ``embeddings`` rows are L2-normalized.

    Always computed in f32, even when the model data path is bf16: once
    embeddings converge, same-track cosine similarities sit within bf16's
    resolution of 1.0 (eps ~8e-3), so a bf16 dot quantizes them all to
    exactly 1 -> every edge hits the atanh clamp -> the 2-component GMM
    degenerates and the score_cut EMA pins at atanh(1-clamp), collapsing
    clustering (observed at epoch ~90 of runs/bc_pallas_bf16_long).  The
    pooled statistics are an f32 island; rows are re-normalized in f32
    because bf16-quantized unit rows carry O(1e-3) norm error.
    """
    # Safe-at-zero normalization (same form as models.blocks.l2_normalize):
    # a norm-based x/max(||x||, eps) has a NaN vjp at padded all-zero rows
    # (0/0 through the norm; the zero cotangent does not stop 0*NaN=NaN).
    emb = normalize_unit_f32(embeddings)
    return cosine_from_endpoints(emb[senders], emb[receivers], mask, clamp)
