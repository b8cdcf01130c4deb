from recom_tpu.parallel.all_to_all_lookup import (  # noqa: F401
    all_to_all_group_pooled,
)
from recom_tpu.parallel.mesh import make_mesh  # noqa: F401
from recom_tpu.parallel.sharded_lookup import sharded_group_pooled  # noqa: F401
