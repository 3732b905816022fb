from vinum_spark.functions.udf import (
    register_python,
    register_numpy,
    register_numpy_agg,
    registered_udf_names,
    ensure_udfs_registered,
)

__all__ = [
    "register_python",
    "register_numpy",
    "register_numpy_agg",
    "registered_udf_names",
    "ensure_udfs_registered",
]
