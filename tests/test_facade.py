"""Station/Stations facade, TimestampPeriod algebra, and plan-quality
(pushdown) checks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weatherdb_spark.broker import Broker
from weatherdb_spark.period import TimestampPeriod
from weatherdb_spark.station import GroupStation, Station, Stations


# ----------------------------------------------------------- TimestampPeriod

def test_period_union_outer_inner():
    a = TimestampPeriod("2020-01-01", "2020-06-01")
    b = TimestampPeriod("2020-03-01", "2020-12-01")
    assert a.union(b, "outer") == TimestampPeriod("2020-01-01", "2020-12-01")
    assert a.union(b, "inner") == TimestampPeriod("2020-03-01", "2020-06-01")
    # disjoint inner -> empty
    c = TimestampPeriod("2021-01-01", "2021-02-01")
    assert a.union(c, "inner").is_empty()
    # NaT bounds are skipped in the comparison (reference
    # TimestampPeriod.py:108-114), not treated as unbounded
    d = TimestampPeriod(None, "2020-06-01")
    assert a.union(d, "outer") == a
    assert a.union(d, "inner") == a


def test_period_inside_contains_expand():
    a = TimestampPeriod("2020-02-01", "2020-03-01")
    b = TimestampPeriod("2020-01-01", "2020-12-01")
    assert a.inside(b) and b.contains(a) and not b.inside(a)
    e = TimestampPeriod("2020-01-01", "2020-01-31").expand_to_timestamp()
    assert e.end == dt.datetime(2020, 1, 31, 23, 59, 59, 999999)


def test_period_accessors_and_comparisons():
    a = TimestampPeriod("2020-02-01", "2020-03-01")
    b = TimestampPeriod("2020-01-01", "2020-12-01")
    # comparisons are containment, not ordering (TimestampPeriod.py:173-184)
    assert a < b and a <= b and b > a and b >= a and a != b
    assert not (b < a)
    # raw tuples coerce like the reference's _check_period
    assert a < ("2020-01-01", "2020-12-01")
    assert a[0] == a["start"] == dt.datetime(2020, 2, 1)
    assert a[1] == a["end"] == dt.datetime(2020, 3, 1)
    assert a.get_period() == (a.start, a.end)
    c = a.copy()
    c["end"] = "2020-04-01"
    assert c != a and a.end == dt.datetime(2020, 3, 1)
    assert a.get_interval() == dt.timedelta(days=29)
    assert a.get_middle() == dt.datetime(2020, 2, 15, 12)
    assert TimestampPeriod(None, None).has_only_NaT()
    assert TimestampPeriod(None, "2020-01-01").get_interval() is None
    assert str(a) == "TimestampPeriod: 2020-02-01 00:00:00 - 2020-03-01 00:00:00"
    with pytest.raises(KeyError):
        a[2]
    # equality coerces raw tuples like the reference's _check_period
    assert a == ("2020-02-01", "2020-03-01")
    assert a != ("2020-02-01", "2020-04-01")
    assert (a == object()) is False
    # __ne__ propagates NotImplemented: Python's identity fallback makes
    # != against a foreign object True, consistent with == being False
    assert (a != object()) is True
    # SQL literal dict with NULL for open bounds (TimestampPeriod.py:286)
    d = a.get_sql_format_dict()
    assert d == {"min_tstp": "'20200201 00:00'", "max_tstp": "'20200301 00:00'"}
    assert TimestampPeriod(None, "2020-01-01").get_sql_format_dict()[
        "min_tstp"] == "NULL"
    # set_tz attaches tzinfo in place and returns self
    z = TimestampPeriod("2020-01-01", "2020-02-01")
    assert z.set_tz(dt.timezone.utc) is z
    assert z.start.tzinfo is dt.timezone.utc and z.end.tzinfo is dt.timezone.utc


# ------------------------------------------------------------------- facade

@pytest.fixture(scope="module")
def mini_broker(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("facade_wh"))
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [(1, "p", True, 0.0, 0.0, 100), (2, "p", True, 10000.0, 0.0, 300),
         (3, "p", True, 20000.0, 0.0, 500)],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int",
    )
    b.update_meta(meta)
    b.update_ma_raster(spark.createDataFrame(
        [(s, "p", t, 800.0 + s) for s in (1, 2, 3) for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    ))
    rows = []
    for s in (1, 2, 3):
        for i in range(400):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i)
            raw = None if (s == 1 and i % 7 == 3) else round((i % 5) * 0.1, 1)
            rows.append((s, ts, raw, raw))
    ts_p = spark.createDataFrame(
        rows, "station_id int, timestamp timestamp, raw double, qc double"
    )
    filled = ts_p.withColumn("filled", F.coalesce("qc", F.lit(0.15))).withColumn(
        "filled_by",
        F.when(F.col("qc").isNull(), F.lit(2)).cast("short"),
    ).withColumn("corr", F.col("filled") * 1.1)
    b.write("ts_p", filled, bucket_by_station=True)
    return b


def test_station_get_df_and_wrappers(mini_broker):
    st = Station(mini_broker, 1, "p")
    raw = st.get_raw()
    assert raw.columns == ["station_id", "timestamp", "raw"]
    assert raw.count() == 400
    best = st.get_df()  # best kind for p = corr
    assert "corr" in best.columns
    agg = st.get_df(kinds=("filled",), agg_to="hour")
    assert agg.count() == 400 // 6 + (1 if 400 % 6 else 0)


def test_station_plot_frame_and_gate(mini_broker):
    st = Station(mini_broker, 1, "p")
    pdf, title, unit = st._plot_frame(kinds=("filled", "corr"))
    assert list(pdf.columns) == ["filled", "corr"]
    assert pdf.index.name == "timestamp"
    assert len(pdf) == 400
    assert pdf.index.is_monotonic_increasing
    assert title == "Precipitation Station 1"
    assert unit == "mm/10min"
    try:
        import matplotlib  # noqa: F401
        has_mpl = True
    except ImportError:
        has_mpl = False
    if not has_mpl:
        with pytest.raises(ImportError, match="matplotlib"):
            # kinds kwarg dedups and overrides kind (StationBases.py:2819-2826)
            st.plot(kinds=["filled", "filled", "corr"])


def test_station_period_and_holes(mini_broker):
    st = Station(mini_broker, 1, "p")
    per = st.get_period_meta("raw")
    assert per.start == dt.datetime(2024, 1, 1)
    assert not per.has_NaT()
    holes = st.count_holes(gap_thresholds=("1 hour",), kind="raw").first()
    assert holes["holes_ge_1_hour"] == 0  # gaps are 20 min at most


def test_station_get_adj_and_dist(mini_broker):
    st = Station(mini_broker, 2, "p")
    adj = st.get_adj(kind="filled", min_count=10)
    assert "adj" in adj.columns
    assert adj.filter(F.col("adj").isNull()).count() == 0
    dist = Station(mini_broker, 1, "p").get_dist()
    donors = dist.filter(F.col("filled_by").isNotNull())
    assert donors.count() > 0
    assert donors.filter(F.col("dist_m").isNull()).count() == 0
    assert donors.first()["dist_m"] == 10000.0  # station 2 is 10 km away


def test_stations_pivot(mini_broker):
    wide = Stations(mini_broker, "p").get_df(stids=[1, 2, 3], kind="raw")
    assert set(wide.columns) == {"timestamp", "1", "2", "3"}
    assert wide.count() == 400


def test_group_station_export(mini_broker, tmp_path):
    import os

    tele = GroupStation(mini_broker, 1).create_ts(
        str(tmp_path / "exp"), parameters=("p",), kind="raw"
    )
    assert tele["p"]["files"] == 1
    path = tmp_path / "exp" / "1" / "P_00001.txt"
    assert os.path.isfile(path)
    lines = path.read_text().splitlines()
    # reference header: Name/Lat lines, then the column header row
    assert lines[0].startswith("Name: ")
    assert lines[1].startswith("Lat: ")
    assert lines[2].split("\t")[:2] == ["Jahr", "Monat"]


def test_group_stations_validate_and_joint_period(mini_broker, tmp_path):
    import os

    from weatherdb_spark.station import GroupStations

    gs = GroupStations(mini_broker)
    with pytest.raises(ValueError):
        gs.get_valid_stids([1, 99])
    per = gs.joint_period([1, 2, 3], kind="raw")
    assert per.start == dt.datetime(2024, 1, 1)
    tele = gs.create_ts([1, 2], str(tmp_path / "grp"), parameters=("p",), kind="raw")
    assert set(tele) == {"p", "telemetry"}
    assert tele["p"]["files"] == 2
    for stid in (1, 2):
        assert os.path.isfile(tmp_path / "grp" / str(stid) / f"P_{stid:05}.txt")


def test_group_stations_zip_export_and_telemetry(mini_broker, tmp_path):
    """out_dir ending .zip bundles the export and every run appends an
    S11 telemetry row (GroupStations.py:386-445)."""
    import os
    import zipfile

    from weatherdb_spark.station import GroupStations

    gs = GroupStations(mini_broker)
    zp = str(tmp_path / "bundle.zip")
    tele = gs.create_ts([1, 2], zp, parameters=("p",), kind="raw")
    assert os.path.isfile(zp)
    assert not os.path.isdir(zp[:-4] + "_tmp_export")  # staging cleaned
    assert tele["zip"]["files"] == 2
    names = set(zipfile.ZipFile(zp).namelist())
    assert {"1/P_00001.txt", "2/P_00002.txt"} <= names
    t = gs.read_telemetry()
    assert t.count() >= 1
    row = t.orderBy(F.desc("ts")).first()
    assert row["quantity"] == 2
    assert row["zip"] is True
    assert row["output_size"] == os.path.getsize(zp)
    assert row["pc"]


def test_group_stations_meta_and_para_objects(mini_broker):
    from weatherdb_spark.station import GroupStations, Stations

    gs = GroupStations(mini_broker)
    stats = gs.get_para_stations()
    assert [s.parameter for s in stats] == ["p", "t", "et"]
    assert all(isinstance(s, Stations) for s in stats)
    with pytest.raises(ValueError, match="p_d"):
        gs.get_para_stations(paras=["p_d"])
    meta = gs.get_meta()
    # the fixture warehouse only has P stations
    assert {r["parameter"] for r in meta.collect()} == {"p"}
    assert gs.get_meta(stids=[1, 2]).count() == 2
    assert "station_id" in gs.get_meta_explanation()


def test_typed_station_classes(mini_broker, monkeypatch):
    import weatherdb_spark
    from weatherdb_spark.station import (
        StationET,
        StationP,
        StationsPD,
        StationsT,
        StationT,
    )

    st = StationP(1, mini_broker)
    assert st.parameter == "p" and st.id == 1
    assert st.get_raw().count() == 400
    assert StationT(2, mini_broker).parameter == "t"
    assert StationET(3, mini_broker).parameter == "et"
    assert StationsT(mini_broker).parameter == "t"
    assert StationsPD(mini_broker).parameter == "p_d"
    # lazy top-level exports resolve (reference weatherdb/__init__.py)
    for name in ("StationP", "StationPD", "StationT", "StationET",
                 "StationsP", "StationsPD", "StationsT", "StationsET"):
        assert getattr(weatherdb_spark, name).PARAMETER
    # the no-broker constructor resolves the warehouse via user config
    monkeypatch.setenv("WEATHERDB_SPARK_WAREHOUSE_DIR", mini_broker.dir)
    from weatherdb_spark.userconfig import get_config

    get_config(reload=True)
    try:
        st2 = StationP(1)
        assert st2.broker.dir == mini_broker.dir
        assert st2.get_raw().count() == 400
    finally:
        monkeypatch.delenv("WEATHERDB_SPARK_WAREHOUSE_DIR")
        get_config(reload=True)


def test_station_predicates_and_small_accessors(mini_broker):
    st = Station(mini_broker, 1, "p")
    assert st.isin_meta() and st.isin_db() and st.isin_ma()
    assert st.is_real() and not st.is_virtual()
    ghost = Station(mini_broker, 99, "p")
    assert not ghost.isin_meta() and not ghost.isin_db() and not ghost.isin_ma()
    qn_like = st.get_filled_period(kind="raw")
    assert qn_like == st.get_period_meta(kind="raw")
    mini_broker.update_ma_timeserie("p", kinds=("raw",), coverage=0.0)
    q = st.get_quotient(kinds=("raw",), which="raster")
    assert q.count() == 1
    assert q.first()["station_id"] == 1


def test_group_station_available_paras(mini_broker):
    from weatherdb_spark.station import GroupStation

    assert GroupStation(mini_broker, 1).get_available_paras() == ["p"]


def test_get_meta_explanation():
    from weatherdb_spark.station import Stations

    exp = Stations.get_meta_explanation()
    assert "station_id" in exp and "richter_class" in exp
    sub = Stations.get_meta_explanation(["lon", "lat"])
    assert set(sub) == {"lon", "lat"}
    with pytest.raises(ValueError, match="unknown meta fields"):
        Stations.get_meta_explanation(["nope"])


def test_get_df_nas_allowed_false_clamps_to_filled_period(spark, tmp_path):
    """nas_allowed=False returns the minimal filled period: leading and
    trailing rows where the asked kind is NULL are cut (reference
    _check_period, StationBases.py:285-345)."""
    b = Broker(spark, str(tmp_path / "wh"))
    rows = []
    for i in range(100):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i)
        qc = None if i < 5 or i >= 97 else float(i % 4)
        rows.append((1, ts, float(i % 4), qc))
    b.write(
        "ts_p",
        spark.createDataFrame(
            rows, "station_id int, timestamp timestamp, raw double, qc double"
        ),
        bucket_by_station=True,
    )
    st = Station(b, 1, "p")
    assert st.get_df(kinds=("qc",)).count() == 100  # default keeps NAs
    clamped = st.get_df(kinds=("qc",), nas_allowed=False)
    assert clamped.count() == 97 - 5
    lo, hi = clamped.agg(F.min("timestamp"), F.max("timestamp")).first()
    assert lo == dt.datetime(2024, 1, 1) + dt.timedelta(minutes=50)
    assert hi == dt.datetime(2024, 1, 1) + dt.timedelta(minutes=960)
    # an explicit period intersects with the filled period
    part = st.get_df(
        kinds=("qc",), nas_allowed=False,
        period=(None, "2024-01-01 02:00:00"),
    )
    assert part.count() == 8  # slots 5..12 (slot 12 is the 02:00 row)
    # a period DISJOINT from the filled period returns zero rows, not the
    # whole series (the reference renders the empty clamped period as NULL
    # SQL bounds -> no rows; forwarding (None, None) would invert this)
    disjoint = st.get_df(
        kinds=("qc",), nas_allowed=False,
        period=("2030-01-01", "2030-02-01"),
    )
    assert disjoint.count() == 0
    assert disjoint.columns == clamped.columns


def test_get_quotient(mini_broker, spark):
    from weatherdb_spark.station import get_quotient

    mini_broker.update_ma_timeserie("p", kinds=("raw", "filled"), coverage=0.0)
    q = get_quotient(mini_broker, parameters=("p",), kinds=("filled",), which="raster")
    assert q.count() == 3
    assert q.filter(F.col("quotient").isNull()).count() == 0


# -------------------------------------------------------------- plan quality

def test_cli_stages_and_export(mini_broker, tmp_path):
    from weatherdb_spark.cli import main

    wh = mini_broker.dir
    assert main(["update-ma-timeserie", "--warehouse", wh, "-p", "p"]) == 0
    assert mini_broker.read("station_ma_timeserie").count() > 0
    out = str(tmp_path / "cli_exp")
    assert main([
        "create-ts", "--warehouse", wh, "--stations", "1", "2",
        "--out-dir", out, "--parameters", "p", "--kind", "raw",
    ]) == 0
    import os
    assert os.path.isfile(os.path.join(out, "1", "P_00001.txt"))


def test_exploded_shingles_no_expensive_prescan_filter(spark):
    """Regression: plain explode() makes Catalyst infer a size()>0 filter
    and push the whole shingle expression below the exchange, serializing
    it onto the pre-shuffle task. The explode_outer form must keep the
    transform() out of any Filter below the Exchange."""
    from weatherdb_spark.llm.dedup import exploded_shingles

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y")], "doc_id long, text string"
    ).coalesce(1)  # emulate the single-split small-file scan
    plan = (
        exploded_shingles(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # everything printed after the Exchange node is the pre-shuffle side
    # (tree prints top-down toward the scan): the shingle transform()
    # expression must not occur there
    assert "Exchange" in plan, plan
    below_exchange = plan.split("Exchange", 1)[1]
    assert "transform(" not in below_exchange, plan


def test_get_df_pushdown(mini_broker):
    """Filters and projection must reach the parquet scan: station filter
    as PushedFilters, kind projection as a narrow ReadSchema."""
    st = Station(mini_broker, 2, "p")
    plan = st.get_raw(period=("2024-01-01", "2024-01-02"))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "station_id" in plan.split("PushedFilters")[1][:200]
    # only the needed columns are read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "raw" in read_schema and "corr" not in read_schema

def test_jaccard_df_cap_drops_stopword_shingles(spark):
    """max_df caps the inverted-index fan-out: a shingle shared by every
    doc must not generate pairs once its document frequency exceeds the
    cap, while rare-shingle overlap still does. With the cap above the
    corpus max df the output is exact."""
    from weatherdb_spark.llm.dedup import jaccard_pairs

    stop = "the quick brown"  # one 3-gram shared by ALL docs
    docs = spark.createDataFrame(
        [
            (1, stop + " fox jumps high"),
            (2, stop + " fox jumps high"),
            (3, stop + " cat sleeps now"),
        ],
        "doc_id long, text string",
    )
    # cap above max df (3): exact — docs 1/2 identical (jaccard 1.0)
    exact = jaccard_pairs(docs, threshold=0.5, max_df=10).collect()
    assert {(r.id_a, r.id_b) for r in exact} == {(1, 2)}

    # cap=2: the stop shingles (df=3) leave the index; 1/2 still pair on
    # their private shingles, and no pair appears from stop-overlap only
    capped = jaccard_pairs(docs, threshold=0.5, max_df=2).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(1, 2)}
    # jaccard became a lower bound (common lost the stop shingles)
    assert capped[0].jaccard <= exact[0].jaccard

    # no cap keeps old exact behavior
    uncapped = jaccard_pairs(docs, threshold=0.5, max_df=None).collect()
    assert {(r.id_a, r.id_b) for r in uncapped} == {(1, 2)}


def test_jaccard_df_cap_reuses_shingle_exchange(spark):
    """The df-count window partitions by the shingle key, so the
    self-join that follows must reuse that partitioning instead of
    adding exchanges: the capped plan may add at most one Exchange
    (and it must contain the window filter)."""
    from weatherdb_spark.llm.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e") for i in range(4)], "doc_id long, text string"
    )
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("+- Exchange") + plan.count(":- Exchange"), plan

    n_capped, plan_capped = n_exchanges(jaccard_pairs(docs, max_df=100))
    n_plain, _ = n_exchanges(jaccard_pairs(docs, max_df=None))
    assert "window" in plan_capped.lower()
    assert n_capped <= n_plain + 1, plan_capped


def test_drop_station_maintenance(spark, tmp_path):
    """F9 maintenance: drop removes the station everywhere, records the
    reason, and update_meta never recreates it (StationBases.py:590-611,
    StationsBase.py:120-128)."""
    import datetime as dt

    b = Broker(spark, str(tmp_path / "drop_wh"))
    meta = spark.createDataFrame(
        [(1, "p", 0.0, 0.0), (2, "p", 1000.0, 0.0), (2, "t", 1000.0, 0.0)],
        "station_id int, parameter string, x_utm double, y_utm double",
    )
    b.update_meta(meta)
    b.write("ts_p", spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0), (2, dt.datetime(2024, 1, 1), 2.0)],
        "station_id int, timestamp timestamp, raw double",
    ), bucket_by_station=True)

    b.drop_station(2, "p", why="test reason")
    assert b.read("ts_p").filter(F.col("station_id") == 2).count() == 0
    assert b.read("meta").filter(
        (F.col("station_id") == 2) & (F.col("parameter") == "p")
    ).count() == 0
    # the t row of station 2 is untouched (drop is per parameter)
    assert b.read("meta").filter(F.col("parameter") == "t").count() == 1
    d = b.read("dropped_stations").first()
    assert (d["station_id"], d["parameter"], d["why"]) == (2, "p", "test reason")

    # re-importing the same meta must NOT resurrect the dropped station
    b.update_meta(meta)
    assert b.read("meta").filter(
        (F.col("station_id") == 2) & (F.col("parameter") == "p")
    ).count() == 0
    assert b.read("meta").count() == 2

    # dropping again updates why (upsert, not append)
    b.drop_station(2, "p", why="second reason")
    dd = b.read("dropped_stations")
    assert dd.count() == 1 and dd.first()["why"] == "second reason"


def test_create_roger_ts_presets(mini_broker, tmp_path):
    """RoGeR presets (GroupStation.py:347-432): toolbox format renames
    files/columns and drops the meta header; plain format writes
    N_<stid:05>.txt with column N."""
    import os

    from weatherdb_spark.station import GroupStations

    gs = GroupStations(mini_broker)
    out = str(tmp_path / "roger_tb")
    gs.create_roger_ts([1], out, kind="raw", do_toolbox_format=True)
    prec = os.path.join(out, "1", "PREC.txt")
    assert os.path.isfile(prec)
    lines = open(prec).read().splitlines()
    # no meta header; renamed date parts + value column
    assert lines[0].split("\t") == ["YYYY", "MM", "DD", "hh", "mm", "PREC"]
    # only ts_p exists in the fixture warehouse -> no TA/PET files
    assert not os.path.exists(os.path.join(out, "1", "TA.txt"))

    out2 = str(tmp_path / "roger_plain")
    gs.create_roger_ts([1], out2, kind="raw")
    n = os.path.join(out2, "1", "N_00001.txt")
    assert os.path.isfile(n)
    lines2 = open(n).read().splitlines()
    assert lines2[0].startswith("Name: ")
    assert lines2[2].split("\t")[-1] == "N"


def test_simhash_exact_beats_prefix_bucketing(spark):
    """Multi-index hamming (simhash_pairs_exact) must find pairs whose
    differing bits fall inside the single prefix bucket's bits — the
    pairs the prefix-bucketed variant structurally misses."""
    from weatherdb_spark.llm.dedup import (
        simhash,
        simhash_pairs,
        simhash_pairs_exact,
    )

    # craft two docs whose fingerprints differ ONLY in high (prefix) bits:
    # search a few word combos until we find such a pair
    docs = spark.createDataFrame(
        [(i, f"w{i} " * 3 + "common words shared by all docs here")
         for i in range(40)],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    import itertools
    target = None
    for a, b in itertools.combinations(sorted(fps), 2):
        x = fps[a] ^ fps[b]
        if 0 < bin(x).count("1") <= 6 and (x >> 24) != 0:
            target = (a, b)
            break
    if target is None:
        import pytest
        pytest.skip("fixture produced no prefix-differing close pair")
    sub = docs.filter(F.col("doc_id").isin(list(target)))
    exact = {(r.id_a, r.id_b) for r in simhash_pairs_exact(sub, max_hamming=6).collect()}
    bucketed = {(r.id_a, r.id_b) for r in simhash_pairs(sub, max_hamming=6).collect()}
    assert target in exact          # multi-index: recall 1
    assert target not in bucketed   # single prefix table misses it


def test_sample_raster_point_and_buffer(spark, tmp_path):
    """S7: clean cells sample at distance 0; a NoData center cell grows
    the buffer in 50 m steps and takes the all_touched zonal mean
    (StationBases.py:2337-2421)."""
    from weatherdb_spark.operators.raster import sample_raster

    # 4x4 grid, res 100, x0=0, y0=400 (north-up). Cell (col,row)=(1,1)
    # covers x 100..200, y 200..300 and is NULL; its 8 neighbors carry 2.0,
    # the rest 9.0
    cells = []
    for col in range(4):
        for row in range(4):
            if (col, row) == (1, 1):
                v = None
            elif abs(col - 1) <= 1 and abs(row - 1) <= 1:
                v = 2.0
            else:
                v = 9.0
            cells.append((col, row, "year", v))
    raster = spark.createDataFrame(cells, "col long, row long, term string, value double")
    stations = spark.createDataFrame(
        [(1, 150.0, 250.0),   # center of the NULL cell
         (2, 250.0, 250.0)],  # center of a 2.0 cell
        "station_id int, x_utm double, y_utm double",
    )
    out = {r["station_id"]: r for r in
           sample_raster(stations, raster, x0=0.0, y0=400.0, res=100.0).collect()}
    assert out[2]["value"] == 2.0 and out[2]["sample_dist_m"] == 0.0
    # station 1: nearest data at box distance 0 < d <= 50 -> step 50,
    # zonal mean of the 8 touched neighbors = 2.0
    assert out[1]["sample_dist_m"] == 50.0
    assert out[1]["value"] == 2.0


def test_update_ma_raster_from_grid(spark, tmp_path):
    from weatherdb_spark.broker import Broker

    b = Broker(spark, str(tmp_path / "s7_wh"))
    b.update_meta(spark.createDataFrame(
        [(1, "p", 150.0, 250.0)],
        "station_id int, parameter string, x_utm double, y_utm double",
    ))
    raster = spark.createDataFrame(
        [(1, 1, "year", 5.0), (1, 1, "wihy", 7.0)],
        "col long, row long, term string, value double",
    )
    b.update_ma_raster_from_grid("p", raster, x0=0.0, y0=400.0, res=100.0)
    rows = {r["term"]: r["value"] for r in b.read("station_ma_raster").collect()}
    assert rows == {"year": 5.0, "wihy": 7.0}


def test_connected_components_path_graph(spark):
    """Min-label propagation must traverse a path graph (diameter >
    1 round) and keep disjoint components apart."""
    from weatherdb_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # path 1-2-3-4-5
         (10, 11),                          # separate pair
         (20, 21), (21, 22), (20, 22)],     # triangle
        "id_a long, id_b long",
    )
    out = {r["doc_id"]: r["component_id"]
           for r in connected_components(pairs).collect()}
    assert {out[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {out[i] for i in (10, 11)} == {10}
    assert {out[i] for i in (20, 21, 22)} == {20}
    assert len(out) == 10


def test_cli_create_roger_ts(mini_broker, tmp_path):
    import os

    from weatherdb_spark.cli import main

    out = str(tmp_path / "cli_roger")
    assert main([
        "create-roger-ts", "--warehouse", mini_broker.dir,
        "--stations", "1", "--out-dir", out, "--kind", "raw",
        "--toolbox-format",
    ]) == 0
    assert os.path.isfile(os.path.join(out, "1", "PREC.txt"))


def test_cli_update_db_stage_sequence(spark, tmp_path):
    """update-db runs quality-check -> fillup -> richter-correct in
    order on the warehouse: after it, ts_p carries qc, filled and corr
    columns with the stage watermarks recorded."""
    import datetime as dt

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.cli import main

    wh = str(tmp_path / "upd_wh")
    b = Broker(spark, wh)
    meta = spark.createDataFrame(
        [(s, p, True, s * 10000.0, 0.0, 100, "no-protection")
         for s in (1, 2, 3) for p in ("p", "p_d", "t")],
        "station_id int, parameter string, is_real boolean, x_utm double, "
        "y_utm double, stationshoehe int, richter_class string",
    )
    rows_10min, rows_daily = [], []
    for s in (1, 2, 3):
        for i in range(200):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i)
            raw = None if (s == 1 and i % 11 == 5) else round((i % 4) * 0.2, 1)
            rows_10min.append((s, ts, raw, 1))
        for d in range(3):
            # close to the 10-min shifted-day sums (~43 mm) so QC-P's
            # daily-consistency rule (sum10 >= 2x daily) keeps the days
            rows_daily.append(
                (s, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 40.0 + s)
            )
    ma = spark.createDataFrame(
        [(s, p, t, 700.0 + s) for s in (1, 2, 3)
         for p in ("p", "p_d", "t") for t in ("year", "wihy", "suhy")],
        "station_id int, parameter string, term string, value double",
    )
    b.update_db(
        meta, ma,
        {
            "p": spark.createDataFrame(
                rows_10min,
                "station_id int, timestamp timestamp, raw double, qn short",
            ),
            "p_d": spark.createDataFrame(
                rows_daily, "station_id int, timestamp timestamp, raw double"
            ),
            "t": spark.createDataFrame(
                [(s, ts.date(), v, v - 2.0, v + 2.0) for s, ts, v in rows_daily],
                "station_id int, timestamp date, raw double, "
                "raw_min double, raw_max double",
            ),
        },
        run_stages=False,
    )
    assert main(["update-db", "--warehouse", wh]) == 0
    ts_p = b.read("ts_p")
    assert {"qc", "filled", "corr"} <= set(ts_p.columns)
    assert ts_p.filter(F.col("filled").isNull()).count() == 0
    stages = {r.stage for r in b.state().collect()}
    assert {"qc", "filled", "corr"} <= stages


def test_station_small_getters(mini_broker):
    """The reference's accessor surface: name, WKT geom (both CRS), MA
    raster values, pairwise coefficients, neighbor ids, max period."""
    st = Station(mini_broker, 1, "p")
    assert st.get_name() == "Station 1"
    assert st.get_geom(crs=25832) == "POINT (0.0 0.0)"
    wkt = st.get_geom()  # 4326 via the S5 transform
    assert wkt.startswith("POINT (") and len(wkt.split()) == 3
    # p's MA terms are [wihy, suhy]; mini_broker stores 800+stid for all
    assert st.get_ma_raster() == [801.0, 801.0]
    # multiplicative parameter -> per-term ratio vs the other station
    coef = st.get_coef(2)
    assert coef == pytest.approx([801.0 / 802.0] * 2)
    assert st.get_coef(99) is None  # missing MA -> None
    nbs = st.get_neighboor_stids(n=2)
    assert nbs == [2, 3]  # distance order from x=0: 10km, then 20km
    p = st.get_max_period(kinds=("raw",), nas_allowed=True)
    assert p.start is not None and p.end > p.start
    p2 = st.get_max_period(kinds=("raw", "filled"))
    assert p2.start is not None
    assert st.get_last_imp_period().is_empty()
    # the single-aggregation form must equal the per-kind intersection
    raw_p = st.get_period_meta(kind="raw")
    fil_p = st.get_period_meta(kind="filled")
    assert p2.start == max(raw_p.start, fil_p.start)
    assert p2.end == min(raw_p.end, fil_p.end)


def test_broker_typed_collection_accessors(mini_broker):
    """Reference broker.py:33-41 exposes stations_pd/_et/_t/_p and the
    ordered list; the engine's lazy properties bind to this broker."""
    from weatherdb_spark.station import StationsP

    assert isinstance(mini_broker.stations_p, StationsP)
    assert mini_broker.stations_p.broker is mini_broker
    params = [s.parameter for s in mini_broker.stations]
    assert params == ["p_d", "et", "t", "p"]  # reference stage order
