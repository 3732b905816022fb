from vinum_spark.functions.udf import (
    register_python,
    register_numpy,
    register_numpy_agg,
    registered_udf_names,
    ensure_udfs_registered,
)
from vinum_spark.functions.agg import sum_overflow_safe

__all__ = [
    "register_python",
    "register_numpy",
    "register_numpy_agg",
    "registered_udf_names",
    "ensure_udfs_registered",
    "sum_overflow_safe",
]
