"""Write reference-format ``.pt`` event fixtures for converter testing.

The reference trains from preprocessed TrackML events stored as torch
pickles of PyG ``Data`` objects (reference ``Modules/utils.py:54``; the
docstring at ``utils.py:39-50`` defines the key schema).  This script
produces a ``{train,val,test}`` tree of ``.pt`` files with that exact key
schema from the synthetic generator, in the THREE pickle layouts
``data.reader.load_event_file`` must handle:

  * ``dict``      -- a plain dict of torch tensors
  * ``attrs``     -- an object whose ``__dict__`` holds the tensors (the
                     pre-2.0 PyG ``Data`` layout; the reference hits this on
                     1GeV files and rebuilds via ``Data.from_dict``)
  * ``store``     -- an object with a ``_store`` mapping (PyG >= 2.0
                     ``Data`` layout)

``types.SimpleNamespace`` stands in for the ``Data`` class so the pickles
load without torch_geometric installed (the pickle only references the
stdlib).  Real reference files deserialize through the same two object
branches.

Usage:
    python scripts/make_pt_fixture.py /tmp/pt_events --events 8
    python scripts/convert_events.py /tmp/pt_events /tmp/npz_events
"""

import argparse
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYOUTS = ("dict", "attrs", "store")


def make_pt_tree(dst_root: str, n_events: int = 8, seed: int = 42,
                 n_particles: int = 25, split=(0.5, 0.25, 0.25)) -> int:
    """Write a {train,val,test} tree of reference-schema .pt events.

    Layouts cycle per event so every tree exercises all three pickle
    branches of ``load_event_file``.  Returns the number written.
    """
    import torch

    from hierarchicalgnn_tpu.data.synthetic import generate_dataset

    events = generate_dataset(n_events, seed=seed, n_particles=n_particles)
    n_train = max(int(n_events * split[0]), 1)
    n_val = max(int(n_events * split[1]), 1)
    subdir = lambda i: ("train" if i < n_train
                        else "val" if i < n_train + n_val else "test")

    for sub in ("train", "val", "test"):
        os.makedirs(os.path.join(dst_root, sub), exist_ok=True)
    for i, event in enumerate(events):
        tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in event.items()}
        layout = LAYOUTS[i % len(LAYOUTS)]
        if layout == "dict":
            obj = tensors
        elif layout == "attrs":
            obj = SimpleNamespace(**tensors)
        else:
            obj = SimpleNamespace(_store=tensors)
        torch.save(obj, os.path.join(dst_root, subdir(i),
                                     f"event{i:06d}_{layout}.pt"))
    return len(events)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dst", help="output tree root")
    ap.add_argument("--events", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--particles", type=int, default=25)
    args = ap.parse_args()
    n = make_pt_tree(args.dst, args.events, args.seed, args.particles)
    print(f"wrote {n} .pt events -> {args.dst}")


if __name__ == "__main__":
    main()
