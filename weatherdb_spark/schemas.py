"""Declared StructTypes for every engine table (SURVEY.md §1).

The reference declares its schema with SQLAlchemy models
(weatherdb/db/models.py:73-401); we declare Spark StructTypes. Measurements
are stored as DoubleType in physical units (not the reference's scaled
integers) with explicit stage-wise rounding where the reference rounds —
see weatherdb_spark.functions.units.
"""

from __future__ import annotations

from pyspark.sql import types as T

META = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("parameter", T.StringType(), False),
    T.StructField("is_real", T.BooleanType(), False),
    T.StructField("stationsname", T.StringType(), True),
    T.StructField("bundesland", T.StringType(), True),
    T.StructField("stationshoehe", T.IntegerType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("x_utm", T.DoubleType(), True),
    T.StructField("y_utm", T.DoubleType(), True),
    T.StructField("raw_from", T.TimestampType(), True),
    T.StructField("raw_until", T.TimestampType(), True),
    T.StructField("hist_until", T.TimestampType(), True),
    T.StructField("last_imp_from", T.TimestampType(), True),
    T.StructField("last_imp_until", T.TimestampType(), True),
    T.StructField("last_imp_qc", T.BooleanType(), True),
    T.StructField("last_imp_filled", T.BooleanType(), True),
    T.StructField("last_imp_corr", T.BooleanType(), True),
    T.StructField("qc_from", T.TimestampType(), True),
    T.StructField("qc_until", T.TimestampType(), True),
    T.StructField("qc_dropped", T.DoubleType(), True),
    T.StructField("filled_from", T.TimestampType(), True),
    T.StructField("filled_until", T.TimestampType(), True),
    T.StructField("corr_from", T.TimestampType(), True),
    T.StructField("corr_until", T.TimestampType(), True),
    T.StructField("horizon", T.DoubleType(), True),
    T.StructField("richter_class", T.StringType(), True),
])

# per-column explanations, the engine twin of the reference's SQLAlchemy
# column comments surfaced by get_meta_explanation (StationBases.py:
# 1758-1776, models.py:73-214 comment= kwargs)
META_EXPLANATIONS: dict[str, str] = {
    "station_id": "official DWD station id",
    "parameter": "the measurement parameter (p, p_d, t, et)",
    "is_real": "false for virtual stations copied from a P location",
    "stationsname": "official station name from the DWD meta file",
    "bundesland": "German federal state of the station",
    "stationshoehe": "station elevation in m above sea level",
    "lon": "longitude in EPSG:4326",
    "lat": "latitude in EPSG:4326",
    "x_utm": "easting in EPSG:25832 (UTM zone 32N)",
    "y_utm": "northing in EPSG:25832 (UTM zone 32N)",
    "raw_from": "first timestamp with raw data",
    "raw_until": "last timestamp with raw data",
    "hist_until": "end of the historical (quality-assured) DWD file",
    "last_imp_from": "start of the last imported period",
    "last_imp_until": "end of the last imported period",
    "last_imp_qc": "was the last import quality checked?",
    "last_imp_filled": "was the last import gap filled?",
    "last_imp_corr": "was the last import Richter corrected?",
    "qc_from": "first quality-checked timestamp",
    "qc_until": "last quality-checked timestamp",
    "qc_dropped": "percent of raw values dropped by quality control",
    "filled_from": "first gap-filled timestamp",
    "filled_until": "last gap-filled timestamp",
    "corr_from": "first Richter-corrected timestamp",
    "corr_until": "last Richter-corrected timestamp",
    "horizon": "Richter horizon angle from the DEM scan",
    "richter_class": "Richter exposure class derived from the horizon",
}

# tall 10-min precipitation facts (reference: one physical table per station,
# StationP.py:240-256; here one table partitioned by bucket(station_id) with
# files sorted on (station_id, timestamp) for row-group period skipping)
TS_P = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("raw", T.DoubleType(), True),
    T.StructField("qn", T.ShortType(), True),
    T.StructField("qc", T.DoubleType(), True),
    T.StructField("filled", T.DoubleType(), True),
    T.StructField("filled_by", T.ShortType(), True),
    T.StructField("corr", T.DoubleType(), True),
])

TS_P_D = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("timestamp", T.DateType(), False),
    T.StructField("raw", T.DoubleType(), True),
    T.StructField("filled", T.DoubleType(), True),
    T.StructField("filled_by", T.ShortType(), True),
])

TS_T = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("timestamp", T.DateType(), False),
    T.StructField("raw", T.DoubleType(), True),
    T.StructField("raw_min", T.DoubleType(), True),
    T.StructField("raw_max", T.DoubleType(), True),
    T.StructField("qc", T.DoubleType(), True),
    T.StructField("filled", T.DoubleType(), True),
    T.StructField("filled_min", T.DoubleType(), True),
    T.StructField("filled_max", T.DoubleType(), True),
    T.StructField("filled_by", T.ArrayType(T.ShortType()), True),
])

TS_ET = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("timestamp", T.DateType(), False),
    T.StructField("raw", T.DoubleType(), True),
    T.StructField("qc", T.DoubleType(), True),
    T.StructField("filled", T.DoubleType(), True),
    T.StructField("filled_by", T.ShortType(), True),
])

STATION_MA_RASTER = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("raster_key", T.StringType(), False),
    T.StructField("parameter", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("distance", T.IntegerType(), True),
])

STATION_MA_TIMESERIE = T.StructType([
    T.StructField("station_id", T.IntegerType(), False),
    T.StructField("parameter", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("value", T.DoubleType(), True),
])

RAW_FILES = T.StructType([
    T.StructField("parameter", T.StringType(), False),
    T.StructField("filepath", T.StringType(), False),
    T.StructField("modtime", T.TimestampType(), True),
])

PIPELINE_STATE = T.StructType([
    T.StructField("parameter", T.StringType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("watermark_from", T.TimestampType(), True),
    T.StructField("watermark_until", T.TimestampType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
])
