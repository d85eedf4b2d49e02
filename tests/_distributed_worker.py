"""Subprocess worker for tests/test_distributed.py.

Run as ``python tests/_distributed_worker.py <process_id> <num_processes>
<coordinator_port>``.  Each process owns 2 virtual CPU devices; together
they form the global ('data', 'graph') mesh with the graph axis kept
process-local (the ICI-domain policy of ``parallel.distributed``, the
DCN/ICI layout for multi-host pods per SURVEY.md §2.4).  Runs one DP
training step of EC-IN where every process contributes its own local
event, and prints the resulting global loss for the parent test to check
against the unsharded single-process oracle.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Single source of truth for the config: losses compared across processes
# must come from the same hparams as the parent test's oracle.
from test_parallel import TINY  # noqa: E402

from hierarchicalgnn_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hierarchicalgnn_tpu.data.event import preprocess_event  # noqa: E402
from hierarchicalgnn_tpu.data.synthetic import generate_dataset  # noqa: E402
from hierarchicalgnn_tpu.models.registry import model_selector  # noqa: E402
from hierarchicalgnn_tpu.parallel.mesh import batch_sharding  # noqa: E402
from hierarchicalgnn_tpu.parallel.step import make_dp_train_step  # noqa: E402
from hierarchicalgnn_tpu.train.optim import make_optimizer  # noqa: E402
from hierarchicalgnn_tpu.train.trainer import Trainer  # noqa: E402

def main():
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    hparams, model, pipeline = model_selector("EC-IN", TINY)
    # every process generates the same dataset deterministically and keeps
    # only its own event -- data never crosses hosts outside the mesh
    events = generate_dataset(nproc, seed=5, n_particles=12)
    evs = [jax.tree.map(np.asarray, preprocess_event(e, hparams))
           for e in events]
    local_batch = jax.tree.map(lambda x: np.stack([x]), evs[pid])

    mesh = distributed.make_global_mesh(graph_per_host=2)
    assert dict(mesh.shape) == {"data": nproc, "graph": 2}
    batch = distributed.globalize_batch(local_batch, batch_sharding(mesh))

    trainer = Trainer(hparams, model, pipeline, run_dir=f"/tmp/dist_{pid}")
    state = trainer.init_state(jax.tree.map(jnp.asarray, evs[0]))
    state = distributed.replicate(state, mesh, check=True)

    step = make_dp_train_step(pipeline, make_optimizer(hparams, nproc), mesh)
    new_state, metrics = step(state, batch, 0)
    loss = float(distributed.read_replicated(metrics["training_loss"]))
    grad_ok = all(
        np.isfinite(distributed.read_replicated(leaf)).all()
        for leaf in jax.tree.leaves(new_state.params))
    print(f"DIST_RESULT pid={pid} loss={loss:.8f} finite={grad_ok}",
          flush=True)


if __name__ == "__main__":
    main()
