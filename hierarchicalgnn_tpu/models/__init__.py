from hierarchicalgnn_tpu.models.mlp import MLP, MatchDims, MaskedBatchNorm  # noqa: F401
from hierarchicalgnn_tpu.models.cells import (  # noqa: F401
    HierarchicalGNNCell, InteractionGNNCell,
)
from hierarchicalgnn_tpu.models.dynamic_graph import DynamicGraphConstruction  # noqa: F401
from hierarchicalgnn_tpu.models.blocks import (  # noqa: F401
    HierarchicalGNNBlock, InteractionGNNBlock, GMRTEncoders,
)
from hierarchicalgnn_tpu.models.models import (  # noqa: F401
    BipartiteClassifierHGNN, EdgeClassifierIN, EmbeddingHGNNGMM, EmbeddingIN,
    GMRT,
)
from hierarchicalgnn_tpu.models.registry import model_selector, available_models  # noqa: F401
