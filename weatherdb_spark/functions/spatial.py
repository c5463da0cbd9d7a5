"""Spatial scalar expressions.

The reference relies on PostGIS ``ST_DISTANCE`` over EPSG:25832 (UTM)
points (StationBases.py:1592-1594, 2285). With UTM easting/northing as plain
double columns the distance is pure arithmetic — no GIS extension, fully
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from weatherdb_spark.config import ELEV_WEIGHT_P1, ELEV_WEIGHT_P2


def euclid_dist(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Planar Euclidean distance in the units of the inputs (m for UTM)."""
    return F.sqrt(F.pow(x1 - x2, 2) + F.pow(y1 - y2, 2))


def elevation_weighted_dist(
    dist: Column,
    h1: Column,
    h2: Column,
    p1: float = ELEV_WEIGHT_P1,
    p2: float = ELEV_WEIGHT_P2,
) -> Column:
    """LARSIM elevation-weighted distance
    ``L * (1 + (|dh| / P1) ** P2)`` (StationBases.py:2196-2209)."""
    return dist * (1 + F.pow(F.abs(h1 - h2) / F.lit(p1), F.lit(p2)))
