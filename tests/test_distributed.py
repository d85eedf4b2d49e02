"""Multi-process (multi-host analogue) distributed training test.

The reference has no distributed support at all (single GPU,
``README.md:65`` flags multi-GPU as unstable).  Here two OS processes --
each owning 2 virtual CPU devices -- form one global ('data' x 'graph')
mesh through ``jax.distributed`` + gloo CPU collectives, the same code
path a v5e pod uses over DCN/ICI.  Each process contributes its own local
event; the DP step's gradient psum crosses the process boundary.  The
resulting loss must equal the unsharded single-process oracle.
"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierarchicalgnn_tpu.data.event import preprocess_event
from hierarchicalgnn_tpu.data.synthetic import generate_dataset
from hierarchicalgnn_tpu.models.registry import model_selector
from hierarchicalgnn_tpu.parallel.mesh import make_mesh
from hierarchicalgnn_tpu.parallel.step import make_dp_train_step, stack_events
from hierarchicalgnn_tpu.train.optim import make_optimizer
from hierarchicalgnn_tpu.train.trainer import Trainer

from test_parallel import TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _oracle_loss():
    """Unsharded single-process loss on the same batch/init as the workers."""
    hparams, model, pipeline = model_selector("EC-IN", TINY)
    events = generate_dataset(NPROC, seed=5, n_particles=12)
    evs = [jax.tree.map(jnp.asarray, preprocess_event(e, hparams))
           for e in events]
    batch = stack_events(evs)
    trainer = Trainer(hparams, model, pipeline, run_dir="/tmp/dist_oracle")
    state = trainer.init_state(evs[0])
    step = make_dp_train_step(pipeline, make_optimizer(hparams, NPROC),
                              make_mesh(data=1, graph=1))
    _, metrics = step(state, batch, 0)
    return float(metrics["training_loss"])


@pytest.mark.slow
def test_two_process_dp_step_matches_oracle():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(NPROC), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        m = re.search(r"DIST_RESULT pid=\d+ loss=([\d.eE+-]+) finite=True",
                      out)
        assert m, f"worker output missing result line:\n{out[-3000:]}"
        losses.append(float(m.group(1)))

    assert losses[0] == losses[1], "processes disagree on the global loss"
    np.testing.assert_allclose(losses[0], _oracle_loss(), rtol=1e-4)
