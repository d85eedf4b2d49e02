"""HierarchicalGNN-TPU: a TPU-native framework for hierarchical GNN particle tracking.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
clairesonglee/HierarchicalGNN reference (PyTorch-Lightning + CUDA libraries):
interaction-network edge classifiers, metric-learning GNN embeddings, and
hierarchical GNNs with GMM-based supernode pooling on TrackML hit graphs.

Design stance (TPU-first, not a port):
  * static shapes everywhere: events are padded to bucketed sizes; every sparse
    structure (edge lists, clusters, kNN results) carries a validity mask.
  * all pooling math (GMM-EM, cut solving, connected components, kNN) runs
    on device inside jit -- no per-step host syncs.
  * sparse aggregation is expressed as segment reductions over sorted-COO /
    row-blocked CSR layouts, with Pallas MXU kernels on the hot path.
  * multi-chip scaling via jax.sharding.Mesh + shard_map (event-level data
    parallelism and edge-partitioned graph parallelism), not NCCL.
"""

__version__ = "0.1.0"

from hierarchicalgnn_tpu.ops.graph import Graph  # noqa: F401
