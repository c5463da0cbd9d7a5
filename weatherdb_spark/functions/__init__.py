from weatherdb_spark.functions.temporal import (
    is_winter,
    shifted_date,
    trunc_expr,
)
from weatherdb_spark.functions.spatial import euclid_dist, elevation_weighted_dist
from weatherdb_spark.functions.units import (
    from_db_unit,
    from_db_units,
    to_db_unit,
    to_db_units,
)

__all__ = [
    "is_winter",
    "shifted_date",
    "trunc_expr",
    "euclid_dist",
    "elevation_weighted_dist",
    "from_db_unit",
    "from_db_units",
    "to_db_unit",
    "to_db_units",
]
