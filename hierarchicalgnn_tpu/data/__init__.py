from hierarchicalgnn_tpu.data.event import Event, preprocess_event  # noqa: F401
from hierarchicalgnn_tpu.data.synthetic import generate_dataset, generate_event  # noqa: F401
