"""Checkpoint / resume / transfer-learning.

Orbax re-design of the reference's Lightning checkpoint flow:
  * per-epoch checkpoints monitoring track_eff, plus ``last``
    (reference ``Notebooks/script.py:19-23``)
  * resume from ``last`` (``script.py:38-50``)
  * transfer learning: load a pretrained checkpoint's parameters into a
    different model, skipping mismatched entries -- the semantics of
    ``load_from_pretrained(strict=False)`` (``Modules/training_utils.py:60-70``)
    and the encoder-skipping BC<->gMRT transfer (``script.py:76-85``).

Learned EMA buffers (``knn_radius``, ``score_cut``) and batch-norm running
stats are part of the checkpointed state, as in the reference's registered
buffers (``Modules/gnn_utils.py:181``).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(run_dir: str, name: str, state_dict: dict,
                    hparams: dict | None = None):
    path = os.path.abspath(os.path.join(run_dir, "checkpoints", name))
    ckptr = _checkpointer()
    ckptr.save(path, state_dict, force=True)
    ckptr.wait_until_finished()
    if hparams is not None:
        with open(os.path.join(run_dir, "checkpoints", "hparams.json"), "w") as f:
            json.dump({k: v for k, v in hparams.items()
                       if isinstance(v, (int, float, str, bool, list, type(None)))},
                      f, indent=2)


def restore_checkpoint(run_dir: str, name: str, abstract_state: dict) -> dict:
    path = os.path.abspath(os.path.join(run_dir, "checkpoints", name))
    ckptr = _checkpointer()
    return ckptr.restore(path, abstract_state)


def load_hparams(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "checkpoints", "hparams.json")) as f:
        return json.load(f)


def transfer_params(target_params: Any, source_params: Any,
                    skip_prefixes: tuple[str, ...] = ()) -> Any:
    """Copy source leaves into the target tree where paths and shapes match.

    ``skip_prefixes`` excludes subtrees (e.g. encoders when transferring a
    pretrained BC model into gMRT's single-layer encoders, reference
    ``script.py:76-85`` / ``gMRT/gmrt_utils.py:28-43``).  Returns the
    merged tree; mismatches keep the target's initialization
    (``strict=False`` semantics).
    """
    src_flat = {jax.tree_util.keystr(kp): leaf for kp, leaf in
                jax.tree_util.tree_flatten_with_path(source_params)[0]}

    def merge(kp, target_leaf):
        key = jax.tree_util.keystr(kp)
        if any(key.startswith(p) or p in key for p in skip_prefixes):
            return target_leaf
        src = src_flat.get(key)
        if src is not None and np.shape(src) == np.shape(target_leaf):
            return src
        return target_leaf

    return jax.tree_util.tree_map_with_path(merge, target_params)
