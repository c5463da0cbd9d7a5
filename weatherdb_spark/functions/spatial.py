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


# ---------------------------------------------------------------- CRS
# EPSG:25832 (ETRS89 / UTM 32N, GRS80) <-> EPSG:4326, as pure column
# expressions via the Karney/Krueger flattening series (public formulae,
# Karney 2011 "Transverse Mercator with an accuracy of a few nanometers";
# series to n^3 is sub-mm over a UTM zone). The reference converts meta
# geometry between 25832 and 4326 with PostGIS on every meta upsert
# (StationsBase.py:147-222, StationBases.py:1817-1846); here the transform
# is JVM-side arithmetic inside whole-stage codegen — no GIS extension.

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0

_N = _GRS80_F / (2.0 - _GRS80_F)
_A_BAR = _GRS80_A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
# forward series (alpha), inverse series (beta), latitude series (delta)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16,
    13 * _N**2 / 48 - 3 * _N**3 / 5,
    61 * _N**3 / 240,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96,
    _N**2 / 48 + _N**3 / 15,
    17 * _N**3 / 480,
)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3,
    7 * _N**2 / 3 - 8 * _N**3 / 5,
    56 * _N**3 / 15,
)


def _atanh(x: Column) -> Column:
    return F.log((1 + x) / (1 - x)) / 2


def wgs84_to_utm(lon: Column, lat: Column, zone: int = 32) -> tuple[Column, Column]:
    """(lon, lat) degrees -> EPSG:258xx (easting, northing) meters."""
    lam0 = F.lit(float((zone * 6 - 183)) * 3.141592653589793 / 180.0)
    phi = F.radians(lat)
    lam = F.radians(lon) - lam0
    e2sqrt = 2.0 * _N**0.5 / (1 + _N)
    t = F.sinh(_atanh(F.sin(phi)) - e2sqrt * _atanh(e2sqrt * F.sin(phi)))
    xi_p = F.atan2(t, F.cos(lam))
    eta_p = _atanh(F.sin(lam) / F.sqrt(1 + t * t))
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + F.lit(a) * F.sin(2 * j * xi_p) * F.cosh(2 * j * eta_p)
        eta = eta + F.lit(a) * F.cos(2 * j * xi_p) * F.sinh(2 * j * eta_p)
    easting = F.lit(_UTM_E0) + F.lit(_UTM_K0 * _A_BAR) * eta
    northing = F.lit(_UTM_K0 * _A_BAR) * xi
    return easting, northing


def utm_to_wgs84(x: Column, y: Column, zone: int = 32) -> tuple[Column, Column]:
    """EPSG:258xx (easting, northing) meters -> (lon, lat) degrees."""
    lam0_deg = float(zone * 6 - 183)
    xi = y / F.lit(_UTM_K0 * _A_BAR)
    eta = (x - F.lit(_UTM_E0)) / F.lit(_UTM_K0 * _A_BAR)
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - F.lit(b) * F.sin(2 * j * xi) * F.cosh(2 * j * eta)
        eta_p = eta_p - F.lit(b) * F.cos(2 * j * xi) * F.sinh(2 * j * eta)
    chi = F.asin(F.sin(xi_p) / F.cosh(eta_p))
    phi = chi
    for j, d in enumerate(_DELTA, start=1):
        phi = phi + F.lit(d) * F.sin(2 * j * chi)
    lam = F.atan2(F.sinh(eta_p), F.cos(xi_p))
    return F.degrees(lam) + F.lit(lam0_deg), F.degrees(phi)


def polar_line(
    center_xy, radius: float, angle_deg: float
) -> list[tuple[float, float]]:
    """Endpoint pair of a ray from ``center_xy`` at ``angle_deg``
    (0 = east, counter-clockwise) and length ``radius`` — the reference's
    shapely LineString builder (utils/geometry.py:15-39) as plain
    coordinate math; the horizon scan (operators/horizon.py) samples the
    same rays vectorized, this is the standalone utility twin."""
    import math

    cx, cy = float(center_xy[0]), float(center_xy[1])
    return [
        (cx, cy),
        (
            cx + math.cos(math.radians(angle_deg)) * radius,
            cy + math.sin(math.radians(angle_deg)) * radius,
        ),
    ]


def raster2points(spark, raster, transform) -> "DataFrame":
    """One (x, y, data) row per non-NaN cell of a single-band raster —
    the reference's GeoDataFrame polygonizer (utils/geometry.py:41-68)
    re-expressed as a Spark DataFrame so downstream joins/samples stay
    distributed.

    ``raster`` is a 2-D array-like (rows x cols); ``transform`` is either
    a rasterio-style affine 6-tuple ``(a, b, c, d, e, f)`` mapping
    fractional (col, row) to (x, y) = (a*col + b*row + c,
    d*col + e*row + f), or a north-up ``(x0, y_TOP, cellsize)`` triple.
    CAREFUL with ESRI-ASCII headers: ``read_ascii_grid`` reports
    ``yllcorner`` — the BOTTOM edge — so convert with
    ``y_top = yllcorner + nrows * cellsize`` (what ``ascii_grid_df``
    does internally); passing ``yllcorner`` directly would mirror every
    y coordinate below the grid. Coordinates are CELL CENTERS
    (col + 0.5, row + 0.5), matching ``rasterio.transform.xy``'s
    default.

    Rasters are dim-sized (a DEM tile, an MA grid — millions of cells,
    not facts), so the cells arrive via one Arrow transfer; the fact-side
    work joins against the returned frame.
    """
    import numpy as np
    import pandas as pd

    arr = np.asarray(raster, dtype="float64")
    if arr.ndim == 3:  # reference passes rasterio's (band, H, W)
        arr = arr[0]
    if len(transform) == 3:
        x0, y_top, cs = (float(v) for v in transform)
        transform = (cs, 0.0, x0, 0.0, -cs, y_top)
    a, b, c, d, e, f = (float(v) for v in transform)
    rows_idx, cols_idx = np.nonzero(~np.isnan(arr))
    col_c, row_c = cols_idx + 0.5, rows_idx + 0.5
    pdf = pd.DataFrame({
        "x": a * col_c + b * row_c + c,
        "y": d * col_c + e * row_c + f,
        "data": arr[rows_idx, cols_idx],
    })
    return spark.createDataFrame(pdf, schema="x double, y double, data double")
