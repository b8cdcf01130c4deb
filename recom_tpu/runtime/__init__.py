from recom_tpu.runtime.executor import Engine  # noqa: F401
