from recom_tpu.native.build import get_lib, native_available  # noqa: F401
from recom_tpu.native import ops  # noqa: F401
