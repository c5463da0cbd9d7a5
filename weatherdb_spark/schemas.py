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

# tall 10-min precipitation facts (reference: one physical table per station,
# StationP.py:240-256; here one table partitioned by bucket(station_id)+month)
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
