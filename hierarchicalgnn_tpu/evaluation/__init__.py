from hierarchicalgnn_tpu.evaluation.tracking import eval_metrics, DEFAULT_RESPONSE  # noqa: F401
