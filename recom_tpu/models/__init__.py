from recom_tpu.models.synthetic import (  # noqa: F401
    make_microbenchmark_model,
    make_dlrm_model,
    make_model_e,
    make_model_f,
    make_random_batch,
)
from recom_tpu.models.criteo import make_criteo_dlrm  # noqa: F401
