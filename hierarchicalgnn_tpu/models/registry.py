"""Model registry: name/ID -> (config, model, pipeline).

Equivalent of ``model_selector`` (reference
``Modules/training_utils.py:22-46``), including the numeric IDs "1"-"5"
documented in the example notebook.
"""

from __future__ import annotations

from hierarchicalgnn_tpu.models.models import (
    BipartiteClassifierHGNN, EdgeClassifierIN, EmbeddingHGNNGMM, EmbeddingIN,
    GMRT,
)
from hierarchicalgnn_tpu.train.pipelines import (
    BipartitePipeline, ECPipeline, EmbeddingPipeline,
)
from hierarchicalgnn_tpu.utils.config import ArchConfig, load_config

_REGISTRY = {
    "EC-IN": ("ec_in", EdgeClassifierIN,
              lambda m, hp: ECPipeline(m, hp)),
    "Embedding-IN": ("embedding_in", EmbeddingIN,
                     lambda m, hp: EmbeddingPipeline(m, hp, hierarchical=False)),
    "Embedding-HGNN-GMM": ("embedding_hgnn_gmm", EmbeddingHGNNGMM,
                           lambda m, hp: EmbeddingPipeline(m, hp, hierarchical=True)),
    "BC-HGNN-GMM": ("bc_hgnn_gmm", BipartiteClassifierHGNN,
                    lambda m, hp: BipartitePipeline(m, hp)),
    "gMRT": ("gmrt", GMRT,
             lambda m, hp: BipartitePipeline(m, hp)),
}

_ALIASES = {"1": "EC-IN", "2": "Embedding-IN", "3": "Embedding-HGNN-GMM",
            "4": "BC-HGNN-GMM", "5": "gMRT"}


def available_models():
    return sorted(_REGISTRY)


def model_selector(model_name: str, sweep_configs: dict | None = None):
    """Returns (hparams, model, pipeline) for a model name or numeric ID."""
    name = _ALIASES.get(str(model_name), str(model_name))
    if name not in _REGISTRY:
        raise ValueError(f"Can't find model name {model_name!r}! "
                         f"Available: {available_models()}")
    config_name, model_cls, pipeline_factory = _REGISTRY[name]
    hparams = load_config(config_name, sweep_configs)
    model = model_cls(ArchConfig.from_hparams(hparams))
    pipeline = pipeline_factory(model, hparams)
    return hparams, model, pipeline
