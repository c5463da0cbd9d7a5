"""S8 — horizon-angle (Horizontabschirmung) computation.

Reference: StationP.py:273-448 casts, per station, a 75-km polar ray for
every azimuth 90°..270° in 3° steps (0° = east, counterclockwise;
utils/geometry.py:15-39), samples the DEM along it, takes the maximum
``degrees(atan((elev - station_elev) / dist))`` per ray, then combines the
per-ray angles with the Richter weighting

    H' = 0.15*H(225,270] + 0.35*H[180,225] + 0.35*H[135,180) + 0.15*H[90,135)

clamped at 0 (StationP.py:436-441). Multi-DEM hole filling
(StationP.py:380-430) is a raster-availability concern; here the DEM is a
pluggable sampler callable so deploys can close over rasterio datasets
while tests use analytic surfaces.

Spark shape: pure per-station geometry -> Arrow-batched ``mapInPandas``
over the (small) meta table; numpy vectorizes the (angles x samples) grid
per station. This is an ingest-time pre-pass — the result lands in the
meta ``horizon`` column, feeding S9 (richter_class).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType([
    T.StructField("station_id", T.IntegerType()),
    T.StructField("horizon", T.DoubleType()),
])

#: (weight, lo, hi, lo_inclusive, hi_inclusive) — StationP.py:436-441
_RICHTER_BANDS = (
    (0.15, 225.0, 270.0, False, True),
    (0.35, 180.0, 225.0, True, True),
    (0.35, 135.0, 180.0, True, False),
    (0.15, 90.0, 135.0, True, False),
)


def station_horizon(
    x: float,
    y: float,
    station_elev: float,
    dem_sampler: Callable[[np.ndarray, np.ndarray], np.ndarray],
    radius_m: float = 75_000.0,
    step_deg: float = 3.0,
    sample_step_m: float = 100.0,
) -> float:
    """Horizon angle for one station (driver-callable core)."""
    angles = np.arange(90.0, 270.0 + step_deg / 2, step_deg)
    dists = np.arange(sample_step_m, radius_m + sample_step_m / 2, sample_step_m)
    rad = np.deg2rad(angles)[:, None]
    xs = x + np.cos(rad) * dists[None, :]
    ys = y + np.sin(rad) * dists[None, :]
    elev = dem_sampler(xs.ravel(), ys.ravel()).reshape(xs.shape)
    with np.errstate(invalid="ignore"):
        slope = np.degrees(np.arctan((elev - station_elev) / dists[None, :]))
        hab = np.nanmax(slope, axis=1)
    total = 0.0
    any_data = False
    for w, lo, hi, lo_inc, hi_inc in _RICHTER_BANDS:
        lo_ok = angles >= lo if lo_inc else angles > lo
        hi_ok = angles <= hi if hi_inc else angles < hi
        band = hab[lo_ok & hi_ok]
        band = band[~np.isnan(band)]  # rays sampled wholly outside the DEM
        if band.size:
            total += w * float(np.mean(band))
            any_data = True
    if not any_data:
        # every ray missed the DEM (station outside coverage): NaN, not a
        # fake flat horizon — callers map it to a NULL horizon so the
        # station visibly lacks a Richter class (the reference raises,
        # StationP.py:418-426)
        return float("nan")
    return max(0.0, total)


def horizon_angles(
    meta: DataFrame,
    dem_sampler: Callable[[np.ndarray, np.ndarray], np.ndarray],
    radius_m: float = 75_000.0,
    step_deg: float = 3.0,
    sample_step_m: float = 100.0,
    x_col: str = "x_utm",
    y_col: str = "y_utm",
    elev_col: str = "stationshoehe",
) -> DataFrame:
    """Compute the horizon column for every station in ``meta``.

    ``dem_sampler(xs, ys) -> elevations`` must be picklable (sent to
    executors); NaN marks no-data. The station's own elevation comes from
    the DEM at the station point, falling back to ``elev_col`` where the
    DEM has a hole (the reference errors instead, StationP.py:418-426)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x, y = getattr(r, x_col), getattr(r, y_col)
                stat_h = dem_sampler(np.array([x]), np.array([y]))[0]
                if np.isnan(stat_h):
                    stat_h = float(getattr(r, elev_col))
                h = station_horizon(
                    x, y, stat_h, dem_sampler,
                    radius_m, step_deg, sample_step_m,
                )
                # NaN (outside DEM coverage) becomes a NULL horizon, not
                # a NaN double that silently poisons the Richter class
                out.append(
                    (int(r.station_id), None if np.isnan(h) else round(h, 3))
                )
            yield pd.DataFrame(out, columns=["station_id", "horizon"])

    cols = ["station_id", x_col, y_col, elev_col]
    from weatherdb_spark.functions.partitioning import spread

    return spread(meta.select(*cols), "station_id").mapInPandas(compute, OUT_SCHEMA)
