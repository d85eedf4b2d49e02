"""Convert reference PyG ``.pt`` events to the framework's on-disk formats.

The reference trains on preprocessed TrackML-1GeV quickstart events stored
as PyG ``Data`` pickles loaded with ``torch.load`` (reference
``Modules/utils.py:54``; dataset pointer ``README.md:65``).  This converter
turns a directory tree of those files into either

  * ``.npz``  -- the framework's preferred portable format
    (``data/reader.py:save_event_npz``), or
  * ``.bin``  -- the compact binary format consumed by the native C++
    prefetching loader (``data/native_loader.py:write_event`` /
    ``native/hgnn_io.cc``), the high-throughput path for large datasets.

The {train,val,test} subdirectory layout is preserved, so the converted
tree drops into ``--input-dir`` / the config's ``input_dir`` unchanged:

    python scripts/convert_events.py /data/trackml_1gev /data/trackml_npz
    python scripts/convert_events.py /data/trackml_1gev /data/trackml_bin \
        --format bin
    python -m hierarchicalgnn_tpu.run train --model 1 \
        --input-dir /data/trackml_npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hierarchicalgnn_tpu.data.reader import (
    EVENT_KEYS, load_event_file, save_event_npz)


def convert_tree(src_root: str, dst_root: str, fmt: str = "npz",
                 subdirs=("train", "val", "test"), limit=None) -> int:
    if fmt == "bin":
        from hierarchicalgnn_tpu.data.native_loader import write_event
    n_done = 0
    for sub in subdirs:
        src = os.path.join(src_root, sub)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(dst_root, sub)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            if limit is not None and n_done >= limit:
                return n_done
            event = load_event_file(os.path.join(src, name))
            missing = [k for k in ("x", "pid", "pt", "edge_index")
                       if k not in event]
            if missing:
                print(f"skip {sub}/{name}: missing keys {missing}")
                continue
            # reference events may lack optional keys; fill neutral values
            n = len(event["pid"])
            e = event["edge_index"].shape[1]
            event.setdefault("cell_data", np.zeros((n, 1), np.float32))
            event.setdefault("hid", np.arange(n, dtype=np.int64))
            event.setdefault("primary", np.zeros(n, np.int64))
            event.setdefault("y_pid", (
                event["pid"][event["edge_index"][0]]
                == event["pid"][event["edge_index"][1]])
                & (event["pid"][event["edge_index"][0]] != 0))
            event.setdefault("y", np.zeros(e, bool))
            base = os.path.splitext(name)[0]
            if fmt == "npz":
                save_event_npz(os.path.join(dst, base + ".npz"), event)
            else:
                write_event(os.path.join(dst, base + ".bin"),
                            {k: np.asarray(event[k]) for k in EVENT_KEYS
                             if k in event})
            n_done += 1
    return n_done


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="reference event tree ({train,val,test}/*.pt)")
    ap.add_argument("dst", help="output tree root")
    ap.add_argument("--format", choices=("npz", "bin"), default="npz")
    ap.add_argument("--limit", type=int, default=None,
                    help="convert at most N events (smoke runs)")
    args = ap.parse_args()
    n = convert_tree(args.src, args.dst, args.format, limit=args.limit)
    print(f"converted {n} events -> {args.dst} ({args.format})")
    if n == 0:
        sys.exit(1)


if __name__ == "__main__":
    main()
