"""Numerics sanitizer: the TPU-native analogue of a race/memory sanitizer.

The reference ships no sanitizers (SURVEY §5: "Race detection /
sanitizers: none").  On TPU the failure modes worth guarding are
numerical, not memory races: bf16 under/overflow, masked-reduction NaN
leaks (0 * NaN = NaN through a padded row), and nondeterministic
reductions silently breaking run reproducibility.  This module provides

  * :func:`finite_report` / :func:`assert_all_finite` -- per-leaf
    finiteness audit of any pytree (params, grads, buffers, metrics),
    reporting the exact leaf paths and bad-entry counts;
  * :func:`check_determinism` -- run a function twice on identical inputs
    and demand bit-identical outputs (catches nondeterministic scatter
    orders and cross-device reduction reorderings);
  * Trainer integration: ``debug_numerics: true`` makes every training
    step validate its loss host-side and, on the first non-finite value,
    dump a full finiteness audit of params/grads and raise (after the
    trainer's autosave-on-exception checkpoint fires), instead of
    training silently into a poisoned state.
"""

from __future__ import annotations

import jax
import numpy as np


def finite_report(tree, max_leaves: int = 0) -> dict[str, tuple[int, int]]:
    """{leaf_path: (n_bad, n_total)} for every non-finite leaf.

    Host-side (fetches the tree): use in failure paths and tests, not in
    the hot loop.  ``max_leaves`` > 0 truncates the report.
    """
    bad = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_bad = int(np.size(arr) - np.isfinite(arr).sum())
        if n_bad:
            bad[jax.tree_util.keystr(kp)] = (n_bad, int(np.size(arr)))
            if max_leaves and len(bad) >= max_leaves:
                break
    return bad


def assert_all_finite(tree, what: str = "tree"):
    """Raise FloatingPointError naming every non-finite leaf."""
    bad = finite_report(tree)
    if bad:
        lines = [f"  {path}: {n}/{total} non-finite"
                 for path, (n, total) in bad.items()]
        raise FloatingPointError(
            f"{what} contains non-finite values:\n" + "\n".join(lines))


def check_determinism(fn, *args, runs: int = 2, what: str = "fn"):
    """Call ``fn(*args)`` ``runs`` times; raise unless outputs are
    bit-identical.  Catches nondeterministic reductions (unordered
    scatter-adds, cross-replica reduction reordering) that silently break
    run-to-run reproducibility."""
    ref = jax.tree.map(np.asarray, fn(*args))
    for r in range(1, runs):
        out = jax.tree.map(np.asarray, fn(*args))
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(ref)[0],
                jax.tree_util.tree_flatten_with_path(out)[0]):
            if not np.array_equal(a, b, equal_nan=True):
                delta = np.max(np.abs(
                    a.astype(np.float64) - b.astype(np.float64)))
                raise AssertionError(
                    f"{what} is nondeterministic at leaf "
                    f"{jax.tree_util.keystr(kp)} (run {r}): max |delta| = "
                    f"{delta}")
    return ref
