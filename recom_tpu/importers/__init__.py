from recom_tpu.importers.tf_graph import (  # noqa: F401
    import_tf_graphdef,
    import_tf_saved_model,
)
