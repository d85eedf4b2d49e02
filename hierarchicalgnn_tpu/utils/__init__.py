from hierarchicalgnn_tpu.utils.config import (  # noqa: F401
    ArchConfig, load_config, process_hparams,
)
