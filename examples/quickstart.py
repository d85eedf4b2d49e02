"""Quickstart: train, evaluate, resume, transfer -- the notebook flow.

Python-script equivalent of the reference's ``Notebooks/example.ipynb``
(train model ID 1-5, monitor tracking metrics, resume from checkpoints,
transfer-learn gMRT from a pretrained BC).  Runs hermetically on the
built-in synthetic TrackML-like generator; point ``input_dir`` at a
directory of preprocessed events for real data.

    python examples/quickstart.py --model 4 --epochs 5
"""

import argparse
import os
import sys

# Self-locating: works without the editable install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hierarchicalgnn_tpu.data import generate_dataset
from hierarchicalgnn_tpu.models import model_selector
from hierarchicalgnn_tpu.train.trainer import Trainer

# Small-but-real sizes so the demo compiles in ~a minute; drop these
# overrides to train the full reference architecture.
DEMO_OVERRIDES = {
    "n_nodes_max": 2048,
    "n_edges_max": 8192,
    "max_clusters": 512,
    "max_particles": 512,
    "latent": 64,
    "n_interaction_graph_iters": 3,
    "n_hierarchical_graph_iters": 3,
    "knn": 20,
    "knn_block_size": 512,
    "train_split": [16, 4, 4],
    "warmup": 10,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="4",
                   help="1=EC-IN 2=Embedding-IN 3=Embedding-HGNN-GMM "
                        "4=BC-HGNN-GMM 5=gMRT")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--run-dir", default="runs/quickstart")
    p.add_argument("--full-size", action="store_true",
                   help="use the full reference architecture sizes")
    args = p.parse_args()

    overrides = {} if args.full_size else dict(DEMO_OVERRIDES)
    hparams, model, pipeline = model_selector(args.model, overrides)
    print(f"model: {hparams['model']}  latent={hparams['latent']} "
          f"iters={hparams.get('n_interaction_graph_iters')}"
          f"+{hparams.get('n_hierarchical_graph_iters', 0)}")

    events = generate_dataset(sum(hparams["train_split"]), seed=42,
                              n_particles=150)
    trainer = Trainer(hparams, model, pipeline, run_dir=args.run_dir,
                      log_every_n_steps=10)
    state = trainer.fit(events, max_epochs=args.epochs)

    print("\ntest metrics:")
    metrics = trainer.test(state, events)
    for k, v in metrics.items():
        print(f"  {k}: {v:.4f}")

    # resume flow (reference script.py resume())
    restored, epoch = trainer.restore(
        "last", trainer.make_datasets(events)[0][0][1])
    print(f"\nrestored checkpoint at epoch {epoch}, step {int(restored.step)}")


if __name__ == "__main__":
    main()
