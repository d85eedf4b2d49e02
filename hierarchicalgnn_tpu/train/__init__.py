from hierarchicalgnn_tpu.train import losses  # noqa: F401
from hierarchicalgnn_tpu.train.optim import make_optimizer, lr_schedule  # noqa: F401
