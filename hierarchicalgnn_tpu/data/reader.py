"""Event-file reading: real preprocessed TrackML events.

The reference loads PyG ``Data`` objects with ``torch.load`` per item in 16
dataloader worker processes (reference ``Modules/utils.py:54``,
``edge_classifier_base.py:41``).  Here reading happens once up front (events
are then padded device arrays reused across epochs); torch (CPU build) is
used only to deserialize ``.pt`` files into numpy.  The native prefetching
path for large datasets lives in ``native/`` (C++ ring-buffer loader).

Also supports ``.npz`` events with the same keys -- the framework's
preferred on-disk format (see :func:`save_event_npz`).
"""

from __future__ import annotations

import os

import numpy as np

EVENT_KEYS = ("x", "cell_data", "pid", "hid", "pt", "primary", "edge_index",
              "modulewise_true_edges", "signal_true_edges", "y", "y_pid")


def load_dataset_paths(input_dir, datatype_names, shuffle_seed: int = 42):
    """Enumerate event files under input_dir/{train,val,test}, deterministic
    seed-42 shuffle (reference ``Modules/utils.py:15-26``)."""
    import random

    all_events = []
    for name in datatype_names:
        sub = os.path.join(input_dir, name)
        if not os.path.isdir(sub):
            continue
        events = sorted(os.path.join(sub, e) for e in os.listdir(sub))
        all_events.extend(events)
    rng = random.Random(shuffle_seed)
    rng.shuffle(all_events)
    return all_events


def load_event_file(path: str) -> dict:
    """One raw event dict (numpy arrays) from .npz or torch .pt."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # torch .pt (PyG Data); torch is CPU-only in this environment
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "__dict__") and not isinstance(obj, dict):
        src = {**getattr(obj, "__dict__", {})}
        # handle PyG Data with _store
        store = src.get("_store")
        if store is not None:
            src = dict(store)
    else:
        src = dict(obj)
    out = {}
    for k, v in src.items():
        if hasattr(v, "numpy"):
            out[k] = v.numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def load_event_dir(input_dir, datatype_names, limit=None):
    paths = load_dataset_paths(input_dir, datatype_names)
    if limit:
        paths = paths[:limit]
    return [load_event_file(p) for p in paths]


def save_event_npz(path: str, event: dict):
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in event.items()
                                 if k in EVENT_KEYS})
