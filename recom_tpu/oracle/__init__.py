from recom_tpu.oracle.reference import OracleModel, oracle_forward  # noqa: F401
from recom_tpu.oracle.hashing import farmhash64, hash_bucket_fast  # noqa: F401
