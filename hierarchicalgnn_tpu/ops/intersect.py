"""Sorted-merge edge-set membership (graph intersection).

Replaces the host-side scipy CSR intersection (reference
``Modules/utils.py:117-166``) used to label mined embedding pairs against
truth edges.  The reference builds two sparse matrices and intersects them
on CPU -- a device->host sync per training step.  Here membership is a
lexsort of the concatenated edge lists with a run-start lookup, entirely
on device with static shapes and int32-safe keys (no N*src+dst encoding,
which overflows int32 for events beyond ~46k hits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def edges_in_set(pred_s, pred_r, pred_mask, truth_s, truth_r, truth_mask):
    """For each predicted edge, is (s, r) present among the truth edges?

    Returns bool[E_pred]; padded pred edges -> False.  Duplicate edges in
    either set are handled (all copies of a pair get the same label).
    """
    nt = truth_s.shape[0]
    s = jnp.concatenate([truth_s, pred_s]).astype(jnp.int32)
    r = jnp.concatenate([truth_r, pred_r]).astype(jnp.int32)
    is_truth = jnp.concatenate([
        jnp.ones((nt,), jnp.int32), jnp.zeros((pred_s.shape[0],), jnp.int32)
    ])
    valid = jnp.concatenate([truth_mask, pred_mask])

    # Sort by (valid desc, s, r, truth-first).  lexsort keys are minor->major.
    order = jnp.lexsort([1 - is_truth, r, s, jnp.logical_not(valid)])
    s_s, r_s = s[order], r[order]
    tag_s, valid_s = is_truth[order], valid[order]

    idx = jnp.arange(s.shape[0], dtype=jnp.int32)
    new_run = jnp.ones_like(valid_s)
    same = (s_s[1:] == s_s[:-1]) & (r_s[1:] == r_s[:-1]) & valid_s[:-1]
    new_run = new_run.at[1:].set(jnp.logical_not(same))
    # Position of each element's run start: truth entries sort first within a
    # run, so the key is in the truth set iff the run head is a truth entry.
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    member_sorted = (tag_s[run_start] == 1) & valid_s

    member = jnp.zeros_like(valid).at[order].set(member_sorted)
    return member[nt:] & pred_mask
