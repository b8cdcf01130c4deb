from recom_tpu.ir.spec import *  # noqa: F401,F403
from recom_tpu.ir.intervals import IntervalSet  # noqa: F401
