from recom_tpu.compiler.lowering import CompiledModel, lower_model  # noqa: F401
from recom_tpu.compiler.buckets import pick_bucket  # noqa: F401
