"""Configuration system.

Mirrors the reference's YAML -> dict -> ``process_hparams`` flow (reference
``Modules/training_utils.py:13-46``): per-pipeline YAML, sweep-override
merge, and derived keys (``hidden = hidden_ratio * latent``, default
``cluster_granularity``).  On top of that, TPU-specific padding/bucketing
keys with sensible defaults, and a hashable architecture dataclass that can
be a flax Module attribute.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np
import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")

_TPU_DEFAULTS = {
    # static capacities (events are padded up to these)
    "n_nodes_max": 4096,
    "n_edges_max": 16384,
    "size_buckets": None,   # [[n_nodes, n_edges], ...] smallest-fit padding
    "max_clusters": 1024,
    "max_particles": 512,
    # kernels / precision
    "use_pallas": False,
    "knn_block_size": 1024,
    "gmm_iters": 60,
    # parallelism
    "mesh_shape": None,          # e.g. {"data": 4, "graph": 2}
    "shard_pooled": True,        # partition supernode space with the graph axis
    "gradient_clip_val": 0.5,
}


def process_hparams(hparams: dict) -> dict:
    """Derived-key post-processing, matching the reference semantics."""
    hparams = dict(hparams)
    if hparams.get("hidden") == "ratio":
        hparams["hidden"] = hparams["hidden_ratio"] * hparams["latent"]
    if "cluster_granularity" not in hparams:
        hparams["cluster_granularity"] = 0
    # MLP remat default is dtype-aware (measured on v5e, BC flagship step):
    # f32 activations are heavy enough that full recompute wins (reference-
    # parity remat=True); bf16 halves the saved-activation traffic and
    # flips it — saving activations beats recompute by ~17%.
    # Normalize dtype *objects* (np.float32/jnp.bfloat16) to their canonical
    # names so they compare equal to string spellings instead of silently
    # taking the wrong remat branch; strings pass through untouched (np.dtype
    # can't parse "bfloat16" unless ml_dtypes happens to be registered).
    raw = hparams.get("compute_dtype") or "float32"
    dtype = raw if isinstance(raw, str) else np.dtype(raw).name
    hparams.setdefault("remat", dtype == "float32")
    for key, value in _TPU_DEFAULTS.items():
        hparams.setdefault(key, value)
    return hparams


def load_config(name_or_path: str, sweep_configs: dict | None = None) -> dict:
    """Load a named config from the package config dir, or a YAML path."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, name_or_path)
        if not path.endswith(".yaml"):
            path += ".yaml"
    with open(path) as f:
        hparams = yaml.safe_load(f)
    return process_hparams({**hparams, **(sweep_configs or {})})


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    """Hashable architecture config for flax modules."""

    spatial_channels: int = 3
    latent: int = 256
    hidden: int = 512
    emb_dim: int = 8
    n_interaction_graph_iters: int = 6
    n_hierarchical_graph_iters: int = 6
    nb_node_layer: int = 3
    nb_edge_layer: int = 2
    output_layers: int = 3
    hidden_activation: str = "GELU"
    hidden_output_activation: str = "Tanh"
    layernorm: bool = True
    share_weight: bool = False
    bipartitegraph_sparsity: int = 5
    supergraph_sparsity: int = 10
    min_cluster_size: int = 3
    cluster_granularity: float = 5.0
    max_clusters: int = 1024
    gmm_iters: int = 60
    knn_block_size: int = 1024
    use_pallas: bool = False
    compute_dtype: str | None = None  # "bfloat16" for 2x-rate MXU matmuls
    # dtype of the EMBEDDING heads.  None (default) = f32 islands: bf16-
    # VALUED embeddings collide once same-track hits converge within bf16
    # quantization and clustering collapses (docs/DESIGN.md "f32 islands";
    # runs/bc_pallas_bf16_long epoch ~90).  "bfloat16" re-opens that path
    # for ablation runs (the r2 `_r2` variant of the seed study).
    emb_head_dtype: str | None = None
    # MLP gradient checkpointing (reference gnn_utils.py:14-15):
    # True = full recompute (reference parity), "dots" = save matmul
    # outputs / recompute elementwise, False = save everything.
    remat: bool | str = True

    @staticmethod
    def from_hparams(hparams: dict) -> "ArchConfig":
        fields = {f.name for f in dataclasses.fields(ArchConfig)}
        kwargs: dict[str, Any] = {}
        for k, v in hparams.items():
            if k in fields and v is not None:
                kwargs[k] = v
        return ArchConfig(**kwargs)
