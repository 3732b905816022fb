from vinum_spark.functions.udf import (
    register_python,
    register_numpy,
    registered_udf_names,
    ensure_udfs_registered,
)

__all__ = [
    "register_python",
    "register_numpy",
    "registered_udf_names",
    "ensure_udfs_registered",
]
