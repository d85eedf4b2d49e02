"""CLI runner end-to-end: train -> resume -> test -> transfer."""

import json

import pytest

from hierarchicalgnn_tpu import run as cli

TINY_SETS = [
    "--set", "n_nodes_max=512", "--set", "n_edges_max=2048",
    "--set", "max_clusters=128", "--set", "max_particles=128",
    "--set", "latent=16", "--set", "n_interaction_graph_iters=1",
    "--set", "n_hierarchical_graph_iters=1", "--set", "knn=5",
    "--set", "knn_block_size=256", "--set", "gmm_iters=10",
    "--set", "train_split=[3,1,1]", "--set", "warmup=2",
    # mode pinned: the shipped BC config defaults to Pallas+bf16 (TPU fast
    # path), which off-TPU runs in slow interpret mode
    "--set", "use_pallas=false", "--set", "compute_dtype=null",
]


def test_cli_train_resume_test(tmp_path, capsys):
    run_dir = str(tmp_path / "run")
    cli.main(["train", "--model", "1", "--run-dir", run_dir,
              "--max-epochs", "1", "--synthetic-particles", "20",
              "--log-every-n-steps", "0"] + TINY_SETS)
    assert (tmp_path / "run" / "checkpoints" / "last").exists()
    assert (tmp_path / "run" / "checkpoints" / "hparams.json").exists()

    cli.main(["resume", "--run-dir", run_dir, "--max-epochs", "2",
              "--synthetic-particles", "20", "--log-every-n-steps", "0"]
             + TINY_SETS)

    cli.main(["test", "--run-dir", run_dir, "--checkpoint", "last",
              "--synthetic-particles", "20", "--log-every-n-steps", "0"]
             + TINY_SETS)
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert "track_eff" in metrics


@pytest.mark.slow
def test_cli_transfer(tmp_path):
    src = str(tmp_path / "bc")
    dst = str(tmp_path / "gmrt")
    cli.main(["train", "--model", "4", "--run-dir", src,
              "--max-epochs", "1", "--synthetic-particles", "15",
              "--log-every-n-steps", "0"] + TINY_SETS)
    cli.main(["transfer", "--model", "5", "--run-dir", dst,
              "--source-run", src, "--checkpoint", "last",
              "--max-epochs", "1", "--synthetic-particles", "15",
              "--log-every-n-steps", "0"] + TINY_SETS)
    assert (tmp_path / "gmrt" / "checkpoints" / "last").exists()
