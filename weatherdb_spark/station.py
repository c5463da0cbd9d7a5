"""Station / Stations / GroupStation facade — the reference's user API
re-expressed over the Broker warehouse.

Reference surface (weatherdb/station/StationBases.py:2463-2761,
stations/StationsBase.py:988-1034, stations/GroupStation.py:135-236):
``StationP(3).get_df(kinds=..., period=..., agg_to=...)``, the
``get_raw/get_qc/get_filled/get_corr`` wrappers, ``get_period_meta``,
``count_holes``, ``get_adj``, ``get_dist``; collection-level ``get_df``
pivots; grouped CSV export.

Everything returns DataFrames; filters push into the parquet scan
(partition pruning on the station bucket + min/max row-group skipping on
station_id/timestamp), so a single-station read from a 100 TB warehouse
touches one bucket's files only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weatherdb_spark.api import get_df
from weatherdb_spark.broker import Broker
from weatherdb_spark.config import PARAMETERS
from weatherdb_spark.operators.aggregate import (
    adjust_series,
    filled_period,
    hole_census,
)
from weatherdb_spark.operators.export import create_ts as _create_ts
from weatherdb_spark.period import TimestampPeriod


def _period_years(period) -> list[int] | None:
    """Calendar years a fully-bounded period touches (for ts_year
    partition pruning); None when either bound is open."""
    if period is None:
        return None
    if isinstance(period, TimestampPeriod):
        start, end = period.strftime() if not period.is_empty() else (None, None)
    else:
        start, end = period
    if start is None or end is None:
        return None
    try:
        y0, y1 = int(str(start)[:4]), int(str(end)[:4])
    except ValueError:
        return None
    return list(range(y0, y1 + 1))


def _max_period_aggs(kinds: Sequence[str]) -> list:
    """Conditional min/max per kind — ONE aggregation job for all kinds
    (not a per-kind job loop). Shared by Station.get_max_period and
    Stations.get_max_periods so the intersection rule cannot drift."""
    aggs = []
    for kind in kinds:
        cond_ts = F.when(F.col(kind).isNotNull(), F.col("timestamp"))
        aggs.append(F.min(cond_ts).alias(f"_{kind}_from"))
        aggs.append(F.max(cond_ts).alias(f"_{kind}_until"))
    return aggs


def _intersect_periods(row, kinds: Sequence[str]) -> TimestampPeriod:
    """Driver-side intersection of the kinds' non-null spans."""
    lo, hi = None, None
    for kind in kinds:
        s, e = row[f"_{kind}_from"], row[f"_{kind}_until"]
        if s is not None and (lo is None or s > lo):
            lo = s
        if e is not None and (hi is None or e < hi):
            hi = e
    return TimestampPeriod(lo, hi)


def _ma_ts_kinds(parameter: str, kind) -> tuple[str, ...]:
    """Kind list for the own-series MA refresh: 'all' = every value kind
    except the exempt ones (qn, filled_by, min/max companions —
    reference valid_kinds, StationBases.py:929-937); unknown kinds raise
    like the reference's _check_kinds instead of silently no-opping."""
    valid = tuple(
        k for k in PARAMETERS[parameter]["kinds"]
        if k not in ("qn", "filled_by") and not k.endswith(("_min", "_max"))
    )
    if kind == "all":
        return valid
    kinds = (kind,) if isinstance(kind, str) else tuple(kind)
    bad = [k for k in kinds if k not in valid]
    if bad:
        raise ValueError(
            f"kinds {bad} invalid for the {parameter!r} MA refresh; "
            f"valid: {list(valid)}"
        )
    return kinds


class Station:
    """One station of one parameter (reference StationBases.StationBase)."""

    def __init__(self, broker: Broker, stid: int, parameter: str):
        if parameter not in PARAMETERS:
            raise ValueError(f"parameter {parameter!r} not in {sorted(PARAMETERS)}")
        self.broker = broker
        self.id = stid
        self.parameter = parameter

    def check_isin_meta(self) -> "Station":
        """Raise if the station is unknown — the reference runs this check
        on every construction (StationBases.py:151,160-167); here it is
        opt-in so bulk construction does not pay one lookup job per
        station. Returns self for chaining."""
        if not self.isin_meta():
            raise KeyError(
                f"station {self.id} ({self.parameter!r}) is not in the "
                "meta table — run update-meta first"
            )
        return self

    @property
    def _ts(self) -> DataFrame:
        return self.broker.read(f"ts_{self.parameter}")

    def _ts_for(self, period) -> DataFrame:
        """Table read with partition pruning to the period's calendar
        years (both bounds known; layout 3 ts_year leaves). The period
        predicate itself still applies in get_df — pruning is an
        optimization, never the filter."""
        return self.broker.read(
            f"ts_{self.parameter}", years=_period_years(period)
        )

    def _check_period(
        self, period, kinds: Sequence[str], nas_allowed: bool = False
    ) -> TimestampPeriod:
        """Resolve/clamp a period against the station's max period
        (reference _check_period, StationBases.py:285-345): None bounds
        fill from the max period; ``nas_allowed=False`` clamps to the
        minimal filled period (intersection of the kinds' non-null
        spans). filled_by alone degrades to nas_allowed=True like the
        reference."""
        kinds = [k for k in kinds if k != "filled_by"]
        if not kinds:
            nas_allowed = True
            kinds = ["raw"]
        maxp = self.get_max_period(kinds=kinds, nas_allowed=nas_allowed)
        if maxp.is_empty():
            raise ValueError(
                f"No maximum period was found for station {self.id} "
                f"parameter {self.parameter!r} and kinds {kinds}."
            )
        given = (
            period if isinstance(period, TimestampPeriod)
            else TimestampPeriod(*period)
        )
        if given.is_empty():
            return maxp
        # A disjoint request collapses to TimestampPeriod(None, None) here
        # (inner-union semantics); callers must NOT forward that as
        # unbounded — the reference renders empty bounds as NULL SQL and
        # returns zero rows (StationBases.py:2490-2494).
        return given.union(maxp, how="inner")

    def get_df(
        self,
        kinds: Sequence[str] = ("best",),
        period: tuple = (None, None),
        agg_to: str | None = None,
        nas_allowed: bool = True,
        **kw,
    ) -> DataFrame:
        """``nas_allowed=False`` returns only the minimal filled period
        (leading/trailing rows where any asked kind is still NULL are cut
        — reference get_df nas_allowed, StationBases.py:2490-2494). The
        True default skips the period-resolution job: an unbounded read
        already equals the reference's max-period read."""
        if not nas_allowed:
            from weatherdb_spark.api import _check_kinds

            resolved = [
                k for k in _check_kinds(self.parameter, kinds) if k != "qn"
            ]
            requested = (
                period if isinstance(period, TimestampPeriod)
                else TimestampPeriod(*period)
            )
            clamped = self._check_period(period, resolved, nas_allowed=False)
            if clamped.is_empty() and not requested.is_empty():
                # Requested period is disjoint from the filled period: the
                # reference returns zero rows, not the whole series.
                return get_df(
                    self._ts, self.parameter, kinds=kinds,
                    period=(None, None), agg_to=agg_to, stids=[self.id],
                    n_buckets=self.broker.bucket_count, **kw,
                ).where(F.lit(False))
            period = clamped.strftime()
        return get_df(
            self._ts_for(period), self.parameter, kinds=kinds, period=period,
            agg_to=agg_to, stids=[self.id],
            n_buckets=self.broker.bucket_count, **kw,
        )

    def drop(self, why: str = "No reason given") -> None:
        """Drop this station from the warehouse and record it in
        ``dropped_stations`` so update_meta never recreates it
        (StationBases.py:590-611)."""
        self.broker.drop_station(self.id, self.parameter, why=why)

    # kind wrappers (StationBases.py:2651-2761, StationP.py:748-752)
    def get_raw(self, **kw) -> DataFrame:
        return self.get_df(kinds=("raw",), **kw)

    def get_qc(self, **kw) -> DataFrame:
        return self.get_df(kinds=("qc",), **kw)

    def get_filled(self, **kw) -> DataFrame:
        return self.get_df(kinds=("filled",), **kw)

    def get_corr(self, **kw) -> DataFrame:
        return self.get_df(kinds=("corr",), **kw)

    def get_qn(self, **kw) -> DataFrame:
        return self.get_df(kinds=("qn",), **kw)

    def get_filled_period(self, kind: str = "filled") -> TimestampPeriod:
        """Reference name for the non-null period of one kind
        (StationBases.py:2100-2131)."""
        return self.get_period_meta(kind=kind)

    def _plot_frame(
        self,
        kinds: Sequence[str] = ("filled",),
        period: tuple = (None, None),
        agg_to: str | None = None,
    ):
        """Data prep for :meth:`plot` — the single driver-side collect of
        the plotted series. Split out so the series/labels are testable
        without matplotlib. Returns ``(pandas_frame_indexed_on_timestamp,
        title, ylabel)``; labels mirror the reference's
        (StationBases.py:2830-2836)."""
        pdf = (
            self.get_df(kinds=kinds, period=period, agg_to=agg_to)
            .toPandas()
            .set_index("timestamp")
            .sort_index()
            .drop(columns=["station_id"], errors="ignore")
        )
        meta = PARAMETERS[self.parameter]
        title = f"{meta['long_name']} Station {self.id}"
        return pdf, title, meta["unit"]

    def plot(
        self,
        period: tuple = (None, None),
        kind: str = "filled",
        agg_to: str | None = None,
        **kwargs,
    ):
        """Plot this station's series (reference plot,
        StationBases.py:2795-2836): ``kinds=[...]`` in kwargs overrides
        ``kind`` with order-preserving dedup, labels are
        Datum / unit / '<para_long> Station <id>'. Collects ONE station's
        (optionally aggregated) series to the driver — bounded by that
        station's history, never a whole-table collect. Requires
        matplotlib (not shipped); raises ImportError with the get_df
        escape hatch otherwise."""
        try:
            import matplotlib  # noqa: F401
        except ImportError as exc:
            # gate BEFORE the collect — paying the distributed read just
            # to raise would waste the whole series scan
            raise ImportError(
                "matplotlib is required for Station.plot(); use "
                "get_df(...).toPandas() to plot manually"
            ) from exc
        kinds = list(dict.fromkeys(kwargs.pop("kinds", [kind])))
        pdf, title, unit = self._plot_frame(
            kinds=kinds, period=period, agg_to=agg_to
        )
        return pdf.plot(xlabel="Datum", ylabel=unit, title=title, **kwargs)

    # ------------------------- per-station stage wrappers. The reference
    # runs each stage station-by-station (StationBases.py:1289-1345); the
    # engine's unit of work is the scoped broker stage, which recomputes
    # only this station and merges it back while the donor pool stays at
    # the full table — same result, one distributed job instead of a
    # per-station SQL loop.
    def quality_check(self) -> None:
        """QC this station's series (reference quality_check,
        StationBases.py:1289-1345)."""
        self.broker.quality_check(
            stids=[self.id], parameters=[self.parameter]
        )

    def fillup(self) -> None:
        """Gap-fill this station from its neighbors (reference fillup,
        StationBases.py:1347-1669)."""
        self.broker.fillup(stids=[self.id], parameters=[self.parameter])

    def richter_correct(self) -> None:
        """Richter-correct this station (reference StationP
        richter_correct, StationP.py:486-652; P only)."""
        if self.parameter != "p":
            raise AttributeError(
                "richter_correct is only defined for 10-min precipitation "
                f"stations, not parameter {self.parameter!r}"
            )
        self.broker.richter_correct_stage(stids=[self.id])

    def corr(self) -> None:
        """Reference alias of :meth:`richter_correct`
        (StationP.py:654-656)."""
        self.richter_correct()

    def last_imp_richter_correct(self) -> None:
        """Richter-correct the pending import window if not yet done
        (reference last_imp_richter_correct, StationP.py:658-684)."""
        if self.parameter != "p":
            raise AttributeError(
                "last_imp_richter_correct is only defined for 10-min "
                f"precipitation stations, not parameter {self.parameter!r}"
            )
        if not self.is_last_imp_done("corr"):
            self.broker.last_imp_corr()

    def last_imp_corr(self) -> None:
        self.last_imp_richter_correct()

    def _require_p(self, what: str) -> None:
        if self.parameter != "p":
            raise AttributeError(
                f"{what} is only defined for 10-min precipitation "
                f"stations, not parameter {self.parameter!r}"
            )

    def update_horizon(self, dem_sampler, skip_if_exist: bool = True,
                       **kw) -> float | None:
        """Recompute this station's horizon angle (and the derived
        Richter class) from a DEM sampler (reference update_horizon,
        StationP.py:293-448; P only). ``skip_if_exist`` keeps a stored
        value like the reference. Returns the (possibly pre-existing)
        horizon."""
        self._require_p("update_horizon")
        if skip_if_exist:
            existing = self.get_horizon()
            if existing is not None:
                return existing
        self.broker.update_horizon(
            dem_sampler, parameter="p", stids=[self.id], **kw
        )
        return self.get_horizon()

    def update_richter_class(self, dem_sampler=None,
                             skip_if_exist: bool = True) -> str | None:
        """Refresh this station's Richter exposure class (reference
        update_richter_class, StationP.py:450-484; P only). With a
        stored horizon the class derives from it directly (one dim
        rewrite); otherwise a ``dem_sampler`` is required to compute the
        horizon first (the offline DEM path of the update-richter-class
        CLI)."""
        self._require_p("update_richter_class")
        if skip_if_exist:
            existing = self.get_richter_class()
            if existing is not None:
                return existing
        horizon = self.get_horizon()
        if horizon is None:
            if dem_sampler is None:
                raise ValueError(
                    f"station {self.id} has no stored horizon — pass a "
                    "dem_sampler (or run the update-richter-class CLI "
                    "with a DEM grid)"
                )
            self.update_horizon(dem_sampler, skip_if_exist=False)
            return self.get_richter_class()
        from weatherdb_spark.operators.richter import richter_class_scalar

        cls = richter_class_scalar(horizon)
        self.broker.update_meta_fields(
            self.parameter, self.id, {"richter_class": cls}
        )
        return cls

    def is_last_imp_done(self, kind: str = "best") -> bool:
        """Is the last import already worked into ``kind``'s stage?
        (reference is_last_imp_done, StationBases.py:779-809). Engine
        watermark granularity is the parameter, not the station — a
        pending import window is owed by the whole parameter table."""
        from weatherdb_spark.api import _check_kinds

        kind = _check_kinds(self.parameter, [kind])[0]
        stage = "corr" if kind == "corr" else ("qc" if kind == "qc" else "filled")
        return self.broker.last_imp_done(self.parameter, stage)

    def last_imp_quality_check(self) -> None:
        """QC the pending import window if not yet done (reference
        last_imp_quality_check, StationBases.py:1720-1734)."""
        if not self.is_last_imp_done("qc"):
            self.broker.last_imp_quality_check(parameters=[self.parameter])

    def last_imp_qc(self) -> None:
        self.last_imp_quality_check()

    def last_imp_fillup(self) -> None:
        """Fill the pending import window if not yet done (reference
        last_imp_fillup, StationBases.py:1736-1766)."""
        if not self.is_last_imp_done("filled"):
            self.broker.last_imp_fillup(parameters=[self.parameter])

    def update_period_meta(self, kind: str = "raw") -> None:
        """Recompute this parameter's period columns in the meta dim
        (reference update_period_meta, StationBases.py:812-848; the
        engine computes every kind's span in the same aggregation job,
        so ``kind`` only exists for signature parity)."""
        del kind
        self.broker.update_period_meta(self.parameter)

    def update_ma_timeseries(self, kind="all") -> None:
        """Refresh this parameter's own-series multi-annual values
        (reference update_ma_timeseries, StationBases.py:916-967):
        yearly aggregate gated at 90 % coverage, averaged over years,
        upserted into ``station_ma_timeserie``."""
        self.broker.update_ma_timeserie(
            self.parameter, kinds=_ma_ts_kinds(self.parameter, kind)
        )

    def get_zipfiles(self, ftp_file_list, only_new: bool = True) -> DataFrame:
        """This station's CDC zip files to import, from an explicit
        ``(filepath, modtime)`` listing (reference get_zipfiles,
        StationBases.py:1143-1245 — there the listing defaults to a live
        FTP fetch; live sockets are out of scope, so the listing is a
        required argument here). ``only_new`` anti-joins the ``raw_files``
        manifest on (filepath, newer modtime) like the reference's
        zipfiles_CDC vs zipfiles_DB join."""
        from weatherdb_spark.sources.ftp import (
            files_to_update,
            listing_df,
            station_zip_files,
        )

        mine = station_zip_files(
            ftp_file_list, self.id,
            zip_regex_prefix=PARAMETERS[self.parameter].get(
                "ftp_zip_regex_prefix"
            ),
        )
        listing = listing_df(self.broker.spark, mine)
        if not only_new:
            return listing
        manifest = (
            self.broker.read("raw_files")
            if self.broker.exists("raw_files") else None
        )
        return files_to_update(listing, manifest)

    def update_raw(self, only_new: bool = True, raw_dir=None) -> None:
        """Import this station's raw data from a directory of DWD zips /
        produkt files (reference update_raw, StationBases.py:1021-1141 —
        minus the live download). Always a keyed merge scoped to this
        station: other stations' rows are untouched. ``only_new=False``
        merely signals that the caller re-supplies the full history —
        the merge replaces matching (station, timestamp) keys either
        way, like the reference's ON CONFLICT upsert. Delegates to the
        collection twin with a one-station scope (ONE implementation of
        the ingest/merge decision)."""
        del only_new
        Stations(self.broker, self.parameter).update_raw(
            stids=[self.id], only_real=False, raw_dir=raw_dir
        )

    def download_raw(self, raw_dir, only_new: bool = False) -> DataFrame:
        """Parse this station's raw timeserie from a directory of DWD
        zips / produkt files WITHOUT updating the warehouse (reference
        download_raw, StationBases.py:1247-1268 — there the files come
        from a live CDC fetch; offline, the caller supplies the
        directory). ``only_new=True`` keeps only timestamps past the
        station's current raw watermark — the offline twin of the
        reference's "only files not yet in the database"."""
        from weatherdb_spark.sources.dwd import ingest_raw_dir

        raw = ingest_raw_dir(self.broker.spark, self.parameter, raw_dir)
        raw = raw.filter(F.col("station_id") == self.id)
        if only_new and self.broker.exists(f"ts_{self.parameter}"):
            have = (
                self._ts.filter(F.col("station_id") == self.id)
                .agg(F.max("timestamp").alias("m"))
                .collect()[0]["m"]
            )
            if have is not None:
                raw = raw.filter(F.col("timestamp") > F.lit(have))
        return raw

    def update_ma_raster(self, raster=None, x0: float = 0.0,
                         y0: float = 0.0, res: float = 1000.0,
                         skip_if_exist: bool = True) -> None:
        """Resample this station's multi-annual raster values (reference
        update_ma_raster, StationBases.py:849-913; the raster arrives as
        a gridded (col, row, term, value) DataFrame instead of a live
        Zenodo file). Delegates to the collection twin with a
        one-station scope."""
        if skip_if_exist and self.isin_ma():
            return
        Stations(self.broker, self.parameter).update_ma_raster(
            stids=[self.id], raster=raster, x0=x0, y0=y0, res=res
        )

    # ------------------------- membership predicates (StationBases.py:
    # 1848-1871 isin_db/isin_meta/isin_ma, 1875-1898 is_virtual/is_real)
    def isin_meta(self) -> bool:
        return self._meta_row() is not None

    def isin_db(self) -> bool:
        """Does the station have timeseries rows?"""
        if not self.broker.exists(f"ts_{self.parameter}"):
            return False
        return (
            self._ts.filter(F.col("station_id") == self.id).limit(1).count() > 0
        )

    def isin_ma(self) -> bool:
        """Does the station have multi-annual raster values?"""
        if not self.broker.exists("station_ma_raster"):
            return False
        return (
            self.broker.read("station_ma_raster")
            .filter(
                (F.col("station_id") == self.id)
                & (F.col("parameter") == self.parameter)
            )
            .limit(1)
            .count()
            > 0
        )

    def is_real(self) -> bool:
        row = self._meta_row()
        if row is None:
            raise ValueError(f"station {self.id}/{self.parameter} not in meta")
        return "is_real" not in row.__fields__ or bool(row["is_real"])

    def is_virtual(self) -> bool:
        return not self.is_real()

    def isin_meta_p(self) -> bool:
        """Is the station in the 10-min precipitation meta? The anchor
        set for virtual-station creation (reference isin_meta_p,
        StationBases.py:2887-2898)."""
        return bool(
            self.broker.read("meta")
            .filter(
                (F.col("station_id") == self.id)
                & (F.col("parameter") == "p")
            )
            .take(1)
        )

    def get_horizon(self) -> float | None:
        """The Richter horizon angle from meta (StationP.py:264-271)."""
        row = self._meta_row()
        return row["horizon"] if row is not None and "horizon" in row.__fields__ else None

    def get_richter_class(self) -> str | None:
        """The stored Richter exposure class (StationP.py:273-292)."""
        row = self._meta_row()
        return (
            row["richter_class"]
            if row is not None and "richter_class" in row.__fields__
            else None
        )

    def get_quotient(self, kinds: Sequence[str] | None = None,
                     which: str = "raster") -> DataFrame:
        """This station's MA quotients (reference StationBases.get_quotient
        → db/queries/get_quotient.py) — the engine-wide quotient views
        filtered to one station."""
        return get_quotient(
            self.broker, parameters=(self.parameter,), kinds=kinds, which=which
        ).filter(F.col("station_id") == self.id)

    def _meta_row(self):
        return (
            self.broker.read("meta")
            .filter(
                (F.col("station_id") == self.id)
                & (F.col("parameter") == self.parameter)
            )
            .first()
        )

    def get_name(self) -> str:
        """Station name from the meta dim (StationBases.py:1872-1873);
        falls back to ``Station <id>`` when meta carries no name column."""
        row = self._meta_row()
        if row is not None and "name" in row.__fields__ and row["name"]:
            return row["name"]
        return f"Station {self.id}"

    def get_geom(self, crs: int = 4326) -> str:
        """WKT point of the station (StationBases.py:1817-1846). crs 4326
        returns POINT (lon lat) via the S5 transform; 25832 returns the
        stored UTM coordinates."""
        row = self._meta_row()
        if row is None:
            raise ValueError(f"station {self.id}/{self.parameter} not in meta")
        if crs == 25832:
            return f"POINT ({row['x_utm']} {row['y_utm']})"
        if crs != 4326:
            raise ValueError("crs must be 4326 or 25832")
        from weatherdb_spark.functions.spatial import utm_to_wgs84

        lonlat = (
            self.broker.spark.range(1)
            .select(
                *utm_to_wgs84(F.lit(row["x_utm"]), F.lit(row["y_utm"]))
            )
            .first()
        )
        return f"POINT ({round(lonlat[0], 6)} {round(lonlat[1], 6)})"

    def get_geom_shp(self, crs: int | None = None) -> str:
        """Deprecated alias of :meth:`get_geom` (the reference deprecates
        it the same way, StationBases.py:1848-1871; returns WKT here —
        shapely is not shipped)."""
        import warnings

        warnings.warn(
            "get_geom_shp is deprecated, use get_geom instead",
            PendingDeprecationWarning,
            stacklevel=2,
        )
        return self.get_geom(crs=4326 if crs is None else crs)

    def get_ma_raster(self) -> list[float] | None:
        """The station's multi-annual raster values in term order
        (StationBases.py:2298-2360): [wihy, suhy] for P, [year]
        otherwise. None when any term is missing."""
        terms = [t for t in PARAMETERS[self.parameter]["ma_terms"] if t != "year"] \
            or ["year"]
        rows = {
            r["term"]: r["value"]
            for r in self.broker.read("station_ma_raster")
            .filter(
                (F.col("station_id") == self.id)
                & (F.col("parameter") == self.parameter)
                & F.col("term").isin(terms)
            )
            .collect()
        }
        if set(terms) - set(rows):
            return None
        return [rows[t] for t in terms]

    def get_multi_annual_raster(self) -> list[float] | None:
        """Reference name for :meth:`get_ma_raster`
        (StationBases.py:2298-2330)."""
        return self.get_ma_raster()

    def get_coef(
        self, other_stid: int, in_db_unit: bool = False
    ) -> list[float] | None:
        """Regionalisation coefficients vs another station
        (StationBases.py:2423-2461): ratio per MA term for multiplicative
        parameters (P), difference for additive (T/ET); ``in_db_unit``
        scales additive coefs to the scaled-int storage unit."""
        own = self.get_ma_raster()
        other = Station(self.broker, other_stid, self.parameter).get_ma_raster()
        if own is None or other is None:
            return None
        cfg = PARAMETERS[self.parameter]
        if cfg["coef_sign"] == "mult":
            return [o / n for o, n in zip(own, other)]
        if in_db_unit:
            return [int(round((o - n) * cfg["decimals"])) for o, n in zip(own, other)]
        return [o - n for o, n in zip(own, other)]

    def get_neighboor_stids(self, n: int = 5) -> list[int]:
        """The n nearest station ids in distance-rank order
        (StationBases.py:2211-2296, J8/W3)."""
        rows = (
            self.broker._knn(self.parameter, k=n)
            .filter(F.col("station_id") == self.id)
            .orderBy("rank")
            .select("nb_station_id")
            .collect()
        )
        return [r["nb_station_id"] for r in rows]

    def get_max_period(
        self, kinds: Sequence[str], nas_allowed: bool = False
    ) -> TimestampPeriod:
        """Maximum available period over the kinds
        (StationBases.py:2133-2178): with ``nas_allowed`` the min/max
        timestamp of the series; else the intersection of the kinds'
        non-null filled periods. Memoized for ~1 min like the
        reference's period cache (StationBases.py:313-356) — entries pin
        the table snapshot, so a write invalidates them immediately."""
        table = f"ts_{self.parameter}"
        key = ("max_period", self.id, tuple(kinds), nas_allowed)
        cached = self.broker.cache_lookup(table, key)
        if cached is not None:
            return cached
        ts = self._ts.filter(F.col("station_id") == self.id)
        if nas_allowed:
            row = ts.agg(F.min("timestamp"), F.max("timestamp")).first()
            result = TimestampPeriod(row[0], row[1])
            self.broker.cache_store(table, key, result)
            return result
        row = ts.agg(*_max_period_aggs(kinds)).first()
        result = _intersect_periods(row, kinds)
        self.broker.cache_store(table, key, result)
        return result

    def get_last_imp_period(self) -> TimestampPeriod:
        """The pending last-import window from the pipeline state
        (StationBases.py:2179-2209)."""
        win = self.broker.last_imp(self.parameter)
        if win is None:
            return TimestampPeriod(None, None)
        return TimestampPeriod(*win)

    def get_period_meta(self, kind: str = "raw") -> TimestampPeriod:
        """A8 — the station's (kind_from, kind_until) period. Memoized
        like :meth:`get_max_period`."""
        table = f"ts_{self.parameter}"
        key = ("period_meta", self.id, kind)
        cached = self.broker.cache_lookup(table, key)
        if cached is not None:
            return cached
        row = (
            filled_period(self._ts.filter(F.col("station_id") == self.id), kind=kind)
            .first()
        )
        if row is None:
            result = TimestampPeriod(None, None)
        else:
            result = TimestampPeriod(row[f"{kind}_from"], row[f"{kind}_until"])
        self.broker.cache_store(table, key, result)
        return result

    def count_holes(
        self,
        gap_thresholds: Sequence[str] = ("2 weeks", "4 weeks"),
        kind: str = "raw",
        period: tuple | None = None,
        between_meta_period: bool = True,
    ) -> DataFrame:
        """A5 — gaps >= each threshold (StationBases.py:1981-2029).

        ``period=None`` is the reference's crop_period=True default (only
        interior gaps); explicit bounds also count leading/trailing holes
        via sentinel rows. ``between_meta_period`` additionally bounds by
        the meta table's ``{kind}_from/until`` columns when the meta dim
        carries them (kind 'qc' uses the raw period, reference
        StationBases.py:1967-1969)."""
        kind_meta = "raw" if kind == "qc" else kind
        meta_period = None
        if between_meta_period:
            meta = self.broker.read("meta").filter(
                (F.col("station_id") == self.id)
                & (F.col("parameter") == self.parameter)
            )
            if {f"{kind_meta}_from", f"{kind_meta}_until"} <= set(meta.columns):
                meta_period = meta.select(
                    "station_id",
                    F.col(f"{kind_meta}_from").alias("period_from"),
                    F.col(f"{kind_meta}_until").alias("period_until"),
                )
        return hole_census(
            self._ts.filter(F.col("station_id") == self.id),
            gap_thresholds=gap_thresholds,
            value_col=kind,
            period=period,
            meta_period=meta_period,
        )

    def get_adj(self, kind: str = "filled", **kw) -> DataFrame:
        """A7 — the MA-adjusted series (StationBases.py:2763-2793).

        P uses separate winter/summer (wihy/suhy) factors with a
        half-year min-count gate and no year truncation
        (StationBases.py:3136-3184); T/ET use a single yearly factor over
        full calendar years only (StationBases.py:3108-3122,
        StationT.py:152-161, StationET.py:102-111)."""
        from weatherdb_spark.operators.aggregate import adjust_series_seasonal

        cfg = PARAMETERS[self.parameter]
        own = self._ts.filter(F.col("station_id") == self.id)
        if "wihy" in cfg["ma_terms"]:
            kw.setdefault("min_count", cfg["adj_min_count"])
            return adjust_series_seasonal(
                own, self.broker._ma_seasonal(self.parameter),
                value_col=kind, **kw,
            )
        kw.setdefault("min_count", cfg["adj_min_count"])
        return adjust_series(
            own,
            self.broker._ma_values(self.parameter),
            coef_sign=cfg["coef_sign"],
            value_col=kind,
            agg_fun=cfg["agg_fun"],
            truncate_years=True,
            **kw,
        )

    def get_dist(self, kind: str = "filled_by") -> DataFrame:
        """J9 — rows with the donor station's distance joined on
        ``filled_by`` (StationBases.py:2700-2761)."""
        knn = self.broker._knn(self.parameter)
        dist = knn.select(
            "station_id",
            F.col("nb_station_id").alias(kind),
            "dist_m",
        )
        own = self._ts.filter(F.col("station_id") == self.id)
        return own.join(F.broadcast(dist), ["station_id", kind], "left")


class Stations:
    """Collection API (reference stations/StationsBase.py)."""

    def __init__(self, broker: Broker, parameter: str):
        self.broker = broker
        self.parameter = parameter

    def get_meta(self, only_real: bool = True) -> DataFrame:
        meta = self.broker.read("meta").filter(F.col("parameter") == self.parameter)
        if only_real and "is_real" in meta.columns:
            meta = meta.filter(F.col("is_real"))
        return meta

    @staticmethod
    def _stids_arg(stids) -> list[int] | None:
        """Reference collection methods take ``stids="all"``
        (StationsBase.py:97,824,931); the broker's scoping arg is
        None-for-all."""
        if stids is None or (isinstance(stids, str) and stids == "all"):
            return None
        return [int(s) for s in stids]

    # ---------------- collection-level stage dispatchers (reference
    # StationsBase.py:763-966 loops per-station methods through a process
    # pool; the engine runs ONE scoped distributed stage instead)
    def quality_check(self, stids="all") -> None:
        self.broker.quality_check(
            stids=self._stids_arg(stids), parameters=[self.parameter]
        )

    def fillup(self, stids="all") -> None:
        self.broker.fillup(
            stids=self._stids_arg(stids), parameters=[self.parameter]
        )

    def last_imp_quality_check(self) -> None:
        """Consume the pending import window's QC for this parameter
        (StationsBase.py:763-787); no-op without a pending window."""
        self.broker.last_imp_quality_check(parameters=[self.parameter])

    def last_imp_fillup(self) -> None:
        self.broker.last_imp_fillup(parameters=[self.parameter])

    def update_period_meta(self, stids="all") -> None:
        """Recompute the parameter's meta period columns
        (StationsBase.py:225-250; the engine's single aggregation job
        covers every station, so ``stids`` only exists for signature
        parity)."""
        del stids
        self.broker.update_period_meta(self.parameter)

    def update_ma_timeseries(self, kind="all", stids="all") -> None:
        """Refresh own-series multi-annual values for every station of
        the parameter (StationsBase.py:891-929)."""
        del stids
        self.broker.update_ma_timeserie(
            self.parameter, kinds=_ma_ts_kinds(self.parameter, kind)
        )

    def download_meta(self, meta_files) -> DataFrame:
        """Parse and join the parameter's DWD station-list file(s)
        (reference download_meta, StationsBase.py:59-95 — there the files
        come from a live CDC fetch; live sockets are out of scope, so the
        file paths are a required argument). Later files only ADD unseen
        stations, and widen ``von_datum``/``bis_datum`` where the newer
        file covers a longer span — the reference's multi-folder join.
        Returns the CDC-shaped frame (pre warehouse mapping)."""
        from weatherdb_spark.sources.dwd import read_meta_txt

        if isinstance(meta_files, str):
            meta_files = [meta_files]
        parsed = [read_meta_txt(self.broker.spark, p) for p in meta_files]
        meta = parsed[0]
        for extra in parsed[1:]:
            unseen = extra.join(
                meta.select("stations_id"), "stations_id", "left_anti"
            )
            meta = meta.unionByName(unseen, allowMissingColumns=True)
            if "bis_datum" in meta.columns and "bis_datum" in extra.columns:
                span = extra.select(
                    "stations_id",
                    F.col("von_datum").alias("_von_new"),
                    F.col("bis_datum").alias("_bis_new"),
                )
                meta = (
                    meta.join(span, "stations_id", "left")
                    .withColumn(
                        "von_datum",
                        F.when(
                            F.col("von_datum") > F.col("_von_new"),
                            F.col("_von_new"),
                        ).otherwise(F.col("von_datum")),
                    )
                    .withColumn(
                        "bis_datum",
                        F.when(
                            F.col("bis_datum") < F.col("_bis_new"),
                            F.col("_bis_new"),
                        ).otherwise(F.col("bis_datum")),
                    )
                    .drop("_von_new", "_bis_new")
                )
        return meta

    def update_meta(self, stids="all", meta_files=None) -> None:
        """Upsert the parameter's meta rows from DWD station-list file(s)
        (reference update_meta, StationsBase.py:97-160). The CDC
        ``von_datum``/``bis_datum`` are deliberately NOT written — the
        reference sets the period columns from the actual filled data
        instead (``update_period_meta``); dropped stations are anti-joined
        away inside ``Broker.update_meta``."""
        if meta_files is None:
            raise ValueError(
                "update_meta needs meta_files= (live CDC download is out "
                "of scope — pass the station-list text file paths)"
            )
        from weatherdb_spark.sources.dwd import meta_from_dwd

        mapped = meta_from_dwd(self.download_meta(meta_files), self.parameter)
        stids_l = self._stids_arg(stids)
        if stids_l is not None:
            mapped = mapped.filter(F.col("station_id").isin(stids_l))
        self.broker.upsert_meta(mapped)

    def update_raw(self, only_new=True, only_real=True, stids="all",
                   raw_dir=None) -> None:
        """Import the parameter's raw data from a directory of DWD zips /
        produkt files (reference update_raw, StationsBase.py:687-763 —
        minus the FTP download, SURVEY §7.4's declared non-goal).

        ``only_new=True`` merges by (station, timestamp) and advances the
        last-import watermark (``Broker.append_raw`` — the reference's
        per-station ON CONFLICT upsert + last_imp bookkeeping). A scoped
        (``stids``/``only_real``) or incremental run always merges;
        only the unscoped ``only_new=False`` bootstrap replaces the raw
        table wholesale like the reference's full re-download."""
        if raw_dir is None:
            raise ValueError(
                "update_raw needs raw_dir= (live CDC download is out of "
                "scope — pass the directory of DWD zip/produkt files)"
            )
        from weatherdb_spark.sources.dwd import ingest_raw_dir

        raw = ingest_raw_dir(self.broker.spark, self.parameter, raw_dir)
        stids_l = self._stids_arg(stids)
        scoped = stids_l is not None
        if scoped:
            raw = raw.filter(F.col("station_id").isin(stids_l))
        if only_real:
            self.broker._require(
                "meta", f"update_raw(only_real=True) on {self.parameter!r}",
                hint="run update-meta first, or pass only_real=False",
            )
            real = self.get_meta(only_real=True).select("station_id")
            raw = raw.join(F.broadcast(real), "station_id", "left_semi")
        if only_new or scoped:
            self.broker.append_raw(self.parameter, raw)
        else:
            self.broker.update_raw(self.parameter, raw)

    def update_ma_raster(self, stids="all", raster=None,
                         x0: float = 0.0, y0: float = 0.0,
                         res: float = 1000.0) -> None:
        """Resample the multi-annual raster values for the parameter's
        stations (reference update_ma_raster, StationsBase.py:857-865;
        the raster arrives as a gridded DataFrame instead of a live
        Zenodo download)."""
        if raster is None:
            raise ValueError(
                "update_ma_raster needs raster= (a gridded "
                "(col, row, term, value) DataFrame) plus its x0/y0/res"
            )
        self.broker.update_ma_raster_from_grid(
            self.parameter, raster, x0=x0, y0=y0, res=res,
            stids=self._stids_arg(stids),
        )

    def update(self, only_new=True, stids="all", raw_dir=None) -> None:
        """Complete update of the parameter's stations: raw import, then
        quality check and fillup — incremental (last-imp) when
        ``only_new``, full otherwise (reference update,
        StationsBase.py:967-987)."""
        self.update_raw(only_new=only_new, stids=stids, raw_dir=raw_dir)
        if only_new:
            self.last_imp_quality_check()
            self.last_imp_fillup()
        else:
            self.quality_check(stids=stids)
            self.fillup(stids=stids)

    @classmethod
    def get_meta_explanation(cls, infos: Sequence[str] | str = "all") -> dict[str, str]:
        """Explanations of the meta columns (reference
        get_meta_explanation, StationBases.py:1758-1776 — SQLAlchemy
        column comments; here the schemas.META_EXPLANATIONS dict)."""
        from weatherdb_spark.schemas import META_EXPLANATIONS

        if infos == "all":
            return dict(META_EXPLANATIONS)
        if isinstance(infos, str):
            # a bare field name must not be iterated character-wise
            infos = [infos]
        unknown = [i for i in infos if i not in META_EXPLANATIONS]
        if unknown:
            raise ValueError(f"unknown meta fields: {unknown}")
        return {i: META_EXPLANATIONS[i] for i in infos}

    def get_df(
        self,
        stids: Sequence[int] | None = None,
        kind: str | Sequence[str] = "best",
        period: tuple = (None, None),
        agg_to: str | None = None,
    ) -> DataFrame:
        """Multi-station read, pivoted wide: one column per station for a
        single kind, ``<stid>_<kind>`` columns for several kinds
        (StationsBase.py:988-1034 concat with MultiIndex columns -> here a
        pivot on station_id)."""
        kinds = (kind,) if isinstance(kind, str) else tuple(kind)
        tall = get_df(
            self.broker.read(f"ts_{self.parameter}", years=_period_years(period)),
            self.parameter,
            kinds=kinds,
            period=period,
            agg_to=agg_to,
            stids=list(stids) if stids is not None else None,
            n_buckets=self.broker.bucket_count,
        )
        kind_cols = [c for c in tall.columns if c not in ("station_id", "timestamp")]
        piv = tall.groupBy("timestamp").pivot(
            "station_id", values=[str(s) for s in stids] if stids else None
        )
        if len(kind_cols) == 1:
            pivoted = piv.agg(F.first(kind_cols[0]))
        else:
            pivoted = piv.agg(*[F.first(c).alias(c) for c in kind_cols])
        return pivoted.orderBy("timestamp")

    def count_holes(
        self,
        stids: Sequence[int] | None = None,
        gap_thresholds: Sequence[str] = ("2 weeks", "4 weeks"),
        kind: str = "raw",
        period: tuple | None = None,
    ) -> DataFrame:
        """A5 over many stations in one job (reference
        StationsBase.count_holes loops Station.count_holes per station)."""
        ts = self.broker.read(f"ts_{self.parameter}")
        if stids is not None:
            ts = ts.filter(F.col("station_id").isin(list(stids)))
        return hole_census(
            ts, gap_thresholds=gap_thresholds, value_col=kind, period=period
        )

    def get_max_periods(
        self, kinds: Sequence[str], nas_allowed: bool = False,
        stids: Sequence[int] | None = None,
    ) -> dict[int, TimestampPeriod]:
        """Batch :meth:`Station.get_max_period` for every station in ONE
        grouped aggregation job (a user looping get_stations() ->
        get_max_period() would otherwise pay N driver jobs). Results are
        seeded into the broker's period memo cache, so subsequent
        per-Station calls are free."""
        table = f"ts_{self.parameter}"
        ts = self.broker.read(table)
        if stids is not None:
            ts = ts.filter(F.col("station_id").isin(list(stids)))
        if nas_allowed:
            rows = ts.groupBy("station_id").agg(
                F.min("timestamp").alias("_from"),
                F.max("timestamp").alias("_until"),
            ).collect()
            out = {
                r["station_id"]: TimestampPeriod(r["_from"], r["_until"])
                for r in rows
            }
        else:
            rows = ts.groupBy("station_id").agg(*_max_period_aggs(kinds)).collect()
            out = {
                r["station_id"]: _intersect_periods(r, kinds) for r in rows
            }
        for stid, period in out.items():
            self.broker.cache_store(
                table, ("max_period", stid, tuple(kinds), nas_allowed), period
            )
        return out

    def get_stations(self, stids: Sequence[int] | None = None) -> list["Station"]:
        """Station objects of this parameter (StationsBase.get_stations)."""
        if stids is None:
            stids = sorted(
                r["station_id"]
                for r in self.get_meta().select("station_id").collect()
            )
        return [Station(self.broker, s, self.parameter) for s in stids]


def get_quotient(
    broker: Broker,
    parameters: Sequence[str] | None = None,
    kinds: Sequence[str] | None = None,
    which: str = "raster",
) -> DataFrame:
    """MA quotient accessor (reference db/queries/get_quotient.py:6-155):
    station/raster quotients (``which='raster'``) or kind/kind quotients
    (``which='kinds'``) with optional parameter/kind filters."""
    broker.register_quotient_views()
    view = "ma_quotient_raster" if which == "raster" else "ma_quotient_kinds"
    df = broker.spark.table(view)
    if parameters:
        df = df.filter(F.col("parameter").isin(list(parameters)))
    if kinds:
        col = "kind" if which == "raster" else "kind_num"
        df = df.filter(F.col(col).isin(list(kinds)))
    return df


class GroupStations:
    """Multi-station export (reference stations/GroupStations.py:296-451):
    validate stids against meta_p, intersect the stations' periods, then
    export each station's series."""

    def __init__(self, broker: Broker):
        self.broker = broker

    def get_valid_stids(self, stids: Sequence[int]) -> list[int]:
        meta_p = self.broker.read("meta").filter(F.col("parameter") == "p")
        known = {r["station_id"] for r in meta_p.select("station_id").collect()}
        bad = [s for s in stids if s not in known]
        if bad:
            raise ValueError(f"station ids not in meta_p: {bad}")
        return list(stids)

    def get_group_stations(self, stids: Sequence[int]) -> list["GroupStation"]:
        """GroupStation objects for valid ids
        (GroupStations.get_group_stations, GroupStations.py:243-268)."""
        return [GroupStation(self.broker, s) for s in self.get_valid_stids(stids)]

    #: the reference group covers the three 'group' parameters — daily
    #: precipitation only feeds P internally (GroupStations.py:246)
    GROUP_PARAS = ("p", "t", "et")

    @staticmethod
    def _check_paras(paras) -> list[str]:
        if isinstance(paras, str) and paras == "all":
            return list(GroupStations.GROUP_PARAS)
        paras = [paras] if isinstance(paras, str) else list(paras)
        bad = [p for p in paras if p not in GroupStations.GROUP_PARAS]
        if bad:
            raise ValueError(
                f"paras {bad} not in {list(GroupStations.GROUP_PARAS)}"
            )
        return paras

    def get_para_stations(self, paras="all") -> list["Stations"]:
        """Collection objects per parameter
        (GroupStations.get_para_stations, GroupStations.py:224-247)."""
        return [Stations(self.broker, p) for p in self._check_paras(paras)]

    def get_meta(self, paras="all", stids="all") -> DataFrame:
        """Meta rows across the group parameters as ONE tall frame with a
        ``parameter`` column (the reference concatenates per-parameter
        pandas frames and multi-indexes, GroupStations.py:173-222 — the
        engine's meta dim is already tall, so this is a filter, not a
        per-parameter read loop)."""
        meta = self.broker.read("meta").filter(
            F.col("parameter").isin(self._check_paras(paras))
        )
        if not (isinstance(stids, str) and stids == "all"):
            meta = meta.filter(
                F.col("station_id").isin([int(s) for s in stids])
            )
        return meta

    @classmethod
    def get_meta_explanation(cls, infos: Sequence[str] | str = "all") -> dict[str, str]:
        """Same explanation table as the per-parameter collections
        (GroupStations.py:156-171)."""
        return Stations.get_meta_explanation(infos)

    def joint_period(self, stids: Sequence[int], kind: str = "filled"):
        """Inner intersection of the stations' periods
        (GroupStations.py:62-85) — ONE grouped job (per-station min/max,
        then max-of-froms / min-of-untils on the driver), not a Spark job
        per station."""
        fp = filled_period(
            self.broker.read("ts_p").filter(F.col("station_id").isin(list(stids))),
            kind=kind,
        )
        row = fp.agg(
            F.max(f"{kind}_from").alias("lo"), F.min(f"{kind}_until").alias("hi")
        ).first()
        return TimestampPeriod(row["lo"], row["hi"])

    def _export_meta(self, stids: Sequence[int]) -> dict:
        """station_id -> (name, lat, lon) for the export header, deriving
        lat/lon from the UTM columns when absent (S5 transform)."""
        from weatherdb_spark.functions.spatial import utm_to_wgs84

        meta = self.broker.read("meta").filter(
            (F.col("parameter") == "p") & F.col("station_id").isin(list(stids))
        )
        if "lat" not in meta.columns:
            lon, lat = utm_to_wgs84(F.col("x_utm"), F.col("y_utm"))
            meta = meta.withColumn("lon", F.round(lon, 6)).withColumn(
                "lat", F.round(lat, 6)
            )
        name_col = (
            F.col("name") if "name" in meta.columns
            else F.concat(F.lit("Station "), F.col("station_id"))
        )
        rows = meta.select(
            "station_id", name_col.alias("name"), "lat", "lon"
        ).collect()
        return {r["station_id"]: (r["name"], r["lat"], r["lon"]) for r in rows}

    def create_ts(
        self,
        stids: Sequence[int],
        out_dir: str,
        parameters: Sequence[str] | str = ("p",),
        kind: str = "best",
        period: tuple = (None, None),
        agg_to: str | None = None,
        file_names: dict[str, str] | None = None,
        col_names: dict[str, str] | None = None,
        r_r0: float | None = None,
        add_meta: bool = True,
        split_date: bool = True,
    ) -> dict:
        """Export every station's series — ONE Spark job per parameter
        (partitionBy(station_id) writes all stations' files in a single
        pass; the reference loops stations, GroupStations.py:296-451),
        then a driver post-pass moves files into the per-station layout
        and prepends the Name/Lat/Lon header (GroupStation.py:633-639).

        ``file_names``/``col_names``/``r_r0``/``add_meta`` mirror the
        reference's create_ts customization hooks (GroupStation.py:434-661):
        per-parameter file-name patterns, output column renames (both the
        value column, keyed by parameter, and the Jahr/Monat/... date
        parts), a constant R/R0 column on the ET series, and the meta
        header toggle — they are what the RoGeR presets set.

        An ``out_dir`` ending in ``.zip`` bundles the whole export into
        that zip file (reference GroupStations.create_ts zip branch,
        GroupStations.py:386-419), and every run appends an S11 timing
        row (quantity/aggregate/zip/pc/duration/output_size — the
        ``needed_download_time`` insert, GroupStations.py:424-445) to the
        warehouse's ``export_telemetry`` table, readable via
        :meth:`read_telemetry`."""
        import os
        import shutil
        import socket
        import time as _time

        from weatherdb_spark.operators.export import (
            finalize_station_files,
            write_telemetry,
            zip_exports,
        )

        t0 = _time.time()
        zip_path = None
        if out_dir.endswith(".zip"):
            zip_path = out_dir
            out_dir = out_dir[:-len(".zip")] + "_tmp_export"
        stids = self.get_valid_stids(stids)
        header_meta = self._export_meta(stids) if add_meta else None
        if parameters == "all":
            parameters = list(PARAMETERS)
        elif isinstance(parameters, str):
            parameters = [parameters]
        tele = {}
        for para in parameters:
            if not self.broker.exists(f"ts_{para}"):
                continue  # paras="all" exports whatever tables exist
            tall = get_df(
                self.broker.read(f"ts_{para}", years=_period_years(period)),
                para, kinds=(kind,),
                stids=list(stids), period=period, agg_to=agg_to,
                n_buckets=self.broker.bucket_count,
            )
            value_col = [
                c for c in tall.columns if c not in ("station_id", "timestamp")
            ][0]
            if col_names and para in col_names:
                tall = tall.withColumnRenamed(value_col, col_names[para])
                value_col = col_names[para]
            value_cols = [value_col]
            if para == "et" and r_r0 is not None:
                tall = tall.withColumn("R/R0", F.lit(float(r_r0)))
                value_cols.append("R/R0")
            staging = f"{out_dir}/_staging_{para}"
            tele[para] = _create_ts(
                tall, staging, value_cols=tuple(value_cols),
                split=split_date, granularity=5 if para == "p" else 3,
                col_names=col_names,
            )
            tele[para]["files"] = finalize_station_files(
                staging, para, out_dir, meta=header_meta,
                file_pattern=(file_names or {}).get(
                    para, "{para}_{id:0>5}.txt"
                ),
            )
            shutil.rmtree(staging, ignore_errors=True)

        if zip_path is not None:
            tele["zip"] = zip_exports(out_dir, zip_path)
            shutil.rmtree(out_dir, ignore_errors=True)
            output_size = tele["zip"]["output_size"]
        else:
            output_size = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(out_dir)
                for f in files
            )
        row = {
            "quantity": len(stids),
            "aggregate": agg_to or "native",
            "zip": zip_path is not None,
            "pc": socket.gethostname(),
            "duration_s": round(_time.time() - t0, 3),
            "output_size": output_size,
        }
        write_telemetry(
            self.broker.spark, row, self.broker.path("export_telemetry")
        )
        tele["telemetry"] = row
        return tele

    def read_telemetry(self) -> DataFrame:
        """The S11 export-telemetry table (needed_download_time,
        models.py:354-386)."""
        from weatherdb_spark.operators.export import read_telemetry

        return read_telemetry(
            self.broker.spark, self.broker.path("export_telemetry")
        )

    def create_roger_ts(
        self,
        stids: Sequence[int],
        out_dir: str,
        kind: str = "best",
        r_r0: float = 1.0,
        do_toolbox_format: bool = False,
    ) -> dict:
        """RoGeR export presets — a thin wrapper over create_ts
        (GroupStation.py:347-432): toolbox format renames the files to
        PREC/TA/PET.txt with YYYY/MM/DD/hh/mm date columns and no meta
        header; the plain variant writes N_<stid:05>.txt with an ``N``
        precipitation column."""
        if do_toolbox_format:
            return self.create_ts(
                stids, out_dir, parameters=("p", "t", "et"), kind=kind,
                r_r0=r_r0,
                file_names={"p": "PREC.txt", "t": "TA.txt", "et": "PET.txt"},
                col_names={"p": "PREC", "t": "TA", "et": "PET",
                           "Jahr": "YYYY", "Monat": "MM", "Tag": "DD",
                           "Stunde": "hh", "Minute": "mm"},
                add_meta=False,
            )
        return self.create_ts(
            stids, out_dir, parameters=("p", "t", "et"), kind=kind,
            r_r0=r_r0,
            file_names={"p": "N_{id:0>5}.txt"},
            col_names={"p": "N"},
        )


class GroupStation:
    """All parameters of one station location + the create_ts export
    (reference stations/GroupStation.py)."""

    def __init__(self, broker: Broker, stid: int):
        self.broker = broker
        self.id = stid

    def get_available_paras(self, only_real: bool = False) -> list[str]:
        """The parameters available at this location (reference
        GroupStation.get_available_paras, GroupStation.py:87-112)."""
        meta = self.broker.read("meta").filter(F.col("station_id") == self.id)
        if only_real and "is_real" in meta.columns:
            meta = meta.filter(F.col("is_real"))
        have = {r["parameter"] for r in meta.select("parameter").collect()}
        return [
            p for p in PARAMETERS
            if p in have and self.broker.exists(f"ts_{p}")
        ]

    def get_df(
        self,
        parameters: Sequence[str] | str = "all",
        kinds: Sequence[str] = ("best",),
        period: tuple = (None, None),
        agg_to: str | None = "day",
        add_t_min: bool = False,
        add_t_max: bool = False,
        **kw,
    ) -> DataFrame:
        """All parameters of this location in one frame, columns prefixed
        ``P_/P_D_/T_/ET_`` (reference GroupStation.get_df,
        GroupStation.py:135-236: per-parameter get_df then a pandas
        concat on the time index). Spark-first: per-parameter projections
        full-outer-joined on timestamp — the same alignment semantics
        (missing rows become NULL), no driver-side concat.

        ``add_t_min``/``add_t_max`` insert the T series' min/max columns
        after each raw/filled kind like the reference (GroupStation.py:
        194-215). ``agg_to='day'`` (the reference default) aligns P's
        10-min lattice with the daily T/ET series; ``agg_to=None`` keeps
        native granularity and leaves T/ET NULL between days."""
        if parameters == "all":
            parameters = [p for p in PARAMETERS
                          if self.broker.exists(f"ts_{p}")]
        elif isinstance(parameters, str):
            # a single parameter name must not be iterated character-wise
            # ('et' -> 'e','t' would silently return the T series)
            parameters = [parameters]
        out = None
        for para in parameters:
            if not self.broker.exists(f"ts_{para}"):
                continue
            use_kinds = list(kinds)
            if para == "t":
                if "best" in use_kinds:
                    use_kinds[use_kinds.index("best")] = \
                        PARAMETERS["t"]["best_kind"]
                for k in ("raw", "filled"):
                    if k in use_kinds:
                        if add_t_max:
                            use_kinds.insert(use_kinds.index(k) + 1, f"{k}_max")
                        if add_t_min:
                            use_kinds.insert(use_kinds.index(k) + 1, f"{k}_min")
            df = Station(self.broker, self.id, para).get_df(
                kinds=tuple(use_kinds), period=period, agg_to=agg_to, **kw
            )
            pref = df.select(
                "timestamp",
                *[
                    F.col(c).alias(f"{para.upper()}_{c}")
                    for c in df.columns
                    if c not in ("station_id", "timestamp")
                ],
            )
            out = pref if out is None else out.join(pref, "timestamp", "full")
        if out is None:
            raise ValueError(
                f"no timeserie found for {parameters} and station {self.id}"
            )
        return out.orderBy("timestamp")

    def create_ts(
        self,
        out_dir: str,
        parameters: Sequence[str] = ("p", "t", "et"),
        kind: str = "best",
        split_date: bool = True,
    ) -> dict:
        """Single-station export — same one-job machinery as
        GroupStations.create_ts restricted to this station
        (GroupStation.py:447-661)."""
        return GroupStations(self.broker).create_ts(
            [self.id], out_dir, parameters=parameters, kind=kind,
            split_date=split_date,
        )


# --------------------------------------------------------------------------
# Typed per-parameter classes — the reference's public surface
# (weatherdb/__init__.py exports StationP/StationPD/StationT/StationET and
# StationsP/StationsPD/StationsT/StationsET; station/StationP.py:55 etc.).
# Constructed like the reference (``StationP(3)``): when no broker is
# given, one is built on the active session with the warehouse directory
# resolving through the user config ([engine] warehouse_dir /
# WEATHERDB_SPARK_WAREHOUSE_DIR) — the engine's analogue of the
# reference's implicit global DB connection.


def _default_broker() -> Broker:
    from weatherdb_spark.session import get_spark

    return Broker(get_spark())


class _TypedStation(Station):
    PARAMETER: str = ""

    def __init__(self, stid: int, broker: Broker | None = None):
        super().__init__(
            broker if broker is not None else _default_broker(),
            stid,
            type(self).PARAMETER,
        )


class StationP(_TypedStation):
    PARAMETER = "p"


class StationPD(_TypedStation):
    PARAMETER = "p_d"


class StationT(_TypedStation):
    PARAMETER = "t"


class StationET(_TypedStation):
    PARAMETER = "et"


class _TypedStations(Stations):
    PARAMETER: str = ""

    def __init__(self, broker: Broker | None = None):
        super().__init__(
            broker if broker is not None else _default_broker(),
            type(self).PARAMETER,
        )


class StationsP(_TypedStations):
    PARAMETER = "p"

    def update_richter_class(self, stids="all", dem_sampler=None,
                             skip_if_exist: bool = True, **kw) -> None:
        """Refresh the Richter exposure classes (reference
        StationsP.update_richter_class, StationsP.py:21-46 — a
        per-station process pool; here ONE distributed stage). With a
        ``dem_sampler`` the horizon angles are recomputed first
        (S8 + S9); without one the classes re-derive from the stored
        horizon column inside the meta rewrite. ``skip_if_exist``
        narrows the expensive DEM scan to stations with no class yet
        (the per-station twin's guard, StationP.py:451-463); pass False
        to force a full recompute like the reference's init step."""
        if dem_sampler is not None:
            scope = self._stids_arg(stids)
            if skip_if_exist:
                meta = self.get_meta(only_real=False)
                if "richter_class" in meta.columns:
                    unset = meta.filter(F.col("richter_class").isNull())
                    if scope is not None:
                        unset = unset.filter(F.col("station_id").isin(scope))
                    scope = [r["station_id"] for r in
                             unset.select("station_id").collect()]
                    if not scope:
                        return  # every station in scope already classed
            self.broker.update_horizon(
                dem_sampler, self.parameter, stids=scope, **kw
            )
            return
        # Broker.update_meta re-derives richter_class from the stored
        # horizon for every row that has one — a full-dim idempotent
        # rewrite, so stids only scopes the DEM path above
        meta = self.broker.read("meta")
        if "horizon" not in meta.columns:
            # same contract as Station.update_richter_class: never
            # report success having computed nothing
            raise ValueError(
                "no stored horizon column in meta — pass a dem_sampler "
                "(or run the update-richter-class CLI with a DEM grid)"
            )
        self.broker.update_meta(meta)

    def richter_correct(self, stids="all") -> None:
        """Richter-correct the filled data (StationsP.py:49-71)."""
        self.broker.richter_correct(stids=self._stids_arg(stids))

    def last_imp_corr(self, stids="all") -> None:
        """Richter-correct the pending import window
        (StationsP.py:74-108); no-op without a pending window."""
        del stids  # the engine's bounded stage covers every station
        self.broker.last_imp_corr()

    def last_imp_richter_correct(self, stids="all") -> None:
        """Reference alias for :meth:`last_imp_corr`."""
        self.last_imp_corr(stids)

    def update(self, only_new=True, stids="all", raw_dir=None) -> None:
        """P's complete update adds the Richter correction after the
        fillup (StationsP.py:111-130)."""
        super().update(only_new=only_new, stids=stids, raw_dir=raw_dir)
        if only_new:
            self.last_imp_richter_correct()
        else:
            self.richter_correct(stids=stids)


class StationsPD(_TypedStations):
    PARAMETER = "p_d"


class StationsT(_TypedStations):
    PARAMETER = "t"


class StationsET(_TypedStations):
    PARAMETER = "et"
