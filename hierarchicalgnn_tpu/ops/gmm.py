"""On-device two-component 1-D Gaussian mixture fitting and cut solving.

The reference fits ``sklearn.mixture.GaussianMixture(n_components=2)`` on
every forward pass (reference ``Modules/BipartiteClassification/Models/
HGNN_GMM.py:192``) and root-finds the edge-cut threshold with scipy
``fsolve`` (``:162-170``) -- two device->host round trips per training
step.  Both are tiny 1-D problems, so here they run inside jit:
fixed-iteration EM with masked statistics, and a bisection root of the
posterior-ratio equation (the posterior ratio crosses zero exactly once
between the two means when a solution exists).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


class GMM2(NamedTuple):
    means: jnp.ndarray    # [2], sorted ascending
    variances: jnp.ndarray  # [2]
    weights: jnp.ndarray  # [2]


def _masked_moments(x, w):
    tot = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(w * x) / tot
    var = jnp.sum(w * jnp.square(x - mean)) / tot
    return mean, var, tot


@functools.partial(jax.jit, static_argnames=("iters",))
def fit_gmm2(x, mask, iters: int = 60, reg_covar: float = 1e-6) -> GMM2:
    """EM fit of a 2-component 1-D mixture over masked samples.

    Initialization splits at the masked median (the 1-D analogue of the
    k-means init sklearn uses), which is robust for the bimodal edge
    likelihood distributions this sees in practice.
    """
    x = x.astype(jnp.float32)
    w = mask.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(w), 1.0)

    # Masked median via sort: invalid entries pushed to +inf.
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    med = xs[jnp.maximum(jnp.sum(mask).astype(jnp.int32) // 2, 0)]
    med = jnp.where(jnp.isfinite(med), med, 0.0)

    lo_w = w * (x < med)
    hi_w = w * (x >= med)
    m0, v0, n0 = _masked_moments(x, lo_w)
    m1, v1, n1 = _masked_moments(x, hi_w)
    means = jnp.stack([m0, m1])
    variances = jnp.maximum(jnp.stack([v0, v1]), reg_covar)
    weights = jnp.stack([n0, n1]) / n_valid
    weights = jnp.maximum(weights, 1e-6)

    def em_step(state, _):
        means, variances, weights = state
        diff = x[:, None] - means[None, :]
        log_p = (-0.5 * (jnp.square(diff) / variances[None, :]
                         + jnp.log(variances[None, :]) + _LOG_2PI)
                 + jnp.log(weights[None, :]))
        resp = jax.nn.softmax(log_p, axis=1) * w[:, None]
        nk = jnp.maximum(jnp.sum(resp, axis=0), 1e-10)
        new_means = jnp.sum(resp * x[:, None], axis=0) / nk
        new_vars = (jnp.sum(resp * jnp.square(x[:, None] - new_means[None, :]),
                            axis=0) / nk) + reg_covar
        new_weights = nk / n_valid
        return (new_means, new_vars, new_weights), None

    (means, variances, weights), _ = jax.lax.scan(
        em_step, (means, variances, weights), None, length=iters)

    order = jnp.argsort(means)
    return GMM2(means[order], variances[order], weights[order])


def _posterior_balance(gmm: GMM2, granularity, x):
    """sigmoid(g) * P(low | x) - sigmoid(-g) * P(high | x).

    The root of this in x is the reference's ``determine_cut`` equation
    (``Modules/BipartiteClassification/Models/HGNN_GMM.py:162-170``):
    the cut where the posterior of the low (cut-away) component, biased by
    the ``cluster_granularity`` prior, balances the high component's.
    """
    log_p = (-0.5 * (jnp.square(x - gmm.means) / gmm.variances
                     + jnp.log(gmm.variances) + _LOG_2PI)
             + jnp.log(jnp.maximum(gmm.weights, 1e-12)))
    post = jax.nn.softmax(log_p)
    g = jnp.asarray(granularity, jnp.float32)
    return jax.nn.sigmoid(g) * post[0] - jax.nn.sigmoid(-g) * post[1]


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_cut(gmm: GMM2, granularity, iters: int = 60):
    """Bisection root of the posterior balance between the two means.

    Returns (cut, valid): ``valid`` is False when no sign change exists in
    (mean_low, mean_high) -- the case where the reference's fsolve lands
    out of range and the EMA update is skipped (``HGNN_GMM.py:202-208``).
    """
    lo0, hi0 = gmm.means[0], gmm.means[1]
    f_lo = _posterior_balance(gmm, granularity, lo0)
    f_hi = _posterior_balance(gmm, granularity, hi0)
    valid = (f_lo > 0) & (f_hi < 0)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        f_mid = _posterior_balance(gmm, granularity, mid)
        lo = jnp.where(f_mid > 0, mid, lo)
        hi = jnp.where(f_mid > 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    cut = 0.5 * (lo + hi)
    return cut, valid
