"""Command-line interface — the engine twin of the reference's click CLI
(weatherdb/cli.py:13-230). stdlib argparse; each command maps to a Broker
stage over a parquet warehouse:

    python -m weatherdb_spark.cli quality-check --warehouse /path/wh
    python -m weatherdb_spark.cli fillup --warehouse /path/wh
    python -m weatherdb_spark.cli richter-correct --warehouse /path/wh
    python -m weatherdb_spark.cli update-ma-timeserie --warehouse /path/wh -p p
    python -m weatherdb_spark.cli create-ts --warehouse /path/wh \
        --stations 1224 1443 --out-dir /tmp/exp
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="weatherdb-spark",
        description="PySpark-native WeatherDB engine (reference cli.py twin)",
    )
    p.add_argument("-v", "--verbose", action="store_true",
                   help="full tracebacks from the safe_entry console "
                        "script (reference cli.py:36-50)")
    sub = p.add_subparsers(dest="command", required=True)

    def wh(sp):
        sp.add_argument("--warehouse", required=True, help="parquet warehouse dir")
        return sp

    wh(sub.add_parser(
        "update-db",
        help="run the compute stages in order: quality-check -> fillup -> "
             "richter-correct (reference cli.py update-db, minus downloads)",
    ))
    for name, hlp in (
        ("quality-check", "QC stage for all parameters"),
        ("fillup", "gap-filling stage for all parameters"),
        ("richter-correct", "Richter correction (p)"),
    ):
        sp = wh(sub.add_parser(name, help=hlp))
        sp.add_argument(
            "--stations", nargs="+", type=int, default=None,
            help="recompute only these stations and merge them back "
                 "(untouched station buckets are carried over unchanged)",
        )
    wh(sub.add_parser("last-imp-quality-check",
                      help="incremental QC bounded to the last-import window"))
    wh(sub.add_parser("last-imp-fillup",
                      help="incremental fillup bounded to the last-import window"))
    wh(sub.add_parser("last-imp-corr",
                      help="incremental Richter correction (p) for the last import"))
    vac = wh(sub.add_parser("vacuum",
                            help="compact fragmented warehouse tables "
                                 "(reference broker.py vacuum)"))
    vac.add_argument(
        "--retention", type=float, default=None, metavar="SECONDS",
        help="snapshot retention override for this vacuum: superseded "
             "table snapshots younger than this stay for in-flight "
             "readers (broker default 300; 0 reclaims everything "
             "superseded NOW — only safe with no concurrent readers)",
    )
    vs = wh(sub.add_parser(
        "versions",
        help="per-table snapshot versions still on disk (time-travel "
             "candidates for Broker.read(version=...))",
    ))
    vs.add_argument("--table", default=None,
                    help="one table (default: every warehouse table)")
    wh(sub.add_parser("force-deactivate",
                      help="clear a stale broker lock "
                           "(reference cli.py force_deactivate_all_broker)"))
    wh(sub.add_parser("upgrade-db-schema",
                      help="migrate/validate the warehouse layout "
                           "(reference cli.py upgrade_db_schema)"))
    wh(sub.add_parser("downgrade-db-schema",
                      help="roll the warehouse layout back one revision "
                           "(alembic downgrade twin): snapshots flatten "
                           "into the table roots"))
    sq = wh(sub.add_parser(
        "sql",
        help="run ANSI SQL over the warehouse tables and views "
             "(reference: ad-hoc psql / db_engine access, "
             "db/connections.py:374)",
    ))
    sq.add_argument("query", help="SQL text; every table is a view, "
                                  "plus ma_quotient_raster/_kinds")
    sq.add_argument("--limit", type=int, default=20,
                    help="rows shown in table mode (default 20)")
    sq.add_argument("--csv", action="store_true",
                    help="stream ALL result rows to stdout as CSV "
                         "(partition-at-a-time, no driver collect)")
    wh(sub.add_parser("set-db-version",
                      help="stamp the warehouse with the current package "
                           "version to prevent full recalculation "
                           "(reference cli.py set_db_version)"))

    um = wh(sub.add_parser(
        "update-meta",
        help="upsert station meta from a DWD station-list text file "
             "(offline tail of reference cli.py update-meta)",
    ))
    um.add_argument("--file", required=True, dest="meta_file")
    um.add_argument("--parameters", nargs="+", default=["p"])

    ur = wh(sub.add_parser(
        "update-raw",
        help="import raw data from a directory of DWD zips / produkt "
             "files (offline tail of reference cli.py update-raw)",
    ))
    ur.add_argument("--dir", required=True, dest="raw_dir")
    ur.add_argument("-p", "--parameter", default="p")
    ur.add_argument("--incremental", action="store_true",
                    help="merge into the existing table and set the "
                         "last-import watermark (append_raw) instead of "
                         "replacing the raw table")

    si = wh(sub.add_parser(
        "stream-import",
        help="tail a directory of CSV drops into the incremental "
             "pipeline: each micro-batch merges via append_raw "
             "(Trigger.AvailableNow — processes what is there, then "
             "exits; re-runs resume from the checkpoint)",
    ))
    si.add_argument("--dir", required=True, dest="stream_dir")
    si.add_argument("-p", "--parameter", default="p")
    si.add_argument("--checkpoint", required=True,
                    help="checkpoint directory (tracks processed files "
                         "across runs)")
    si.add_argument("--schema",
                    default="station_id int, timestamp timestamp, "
                            "raw double, qn short",
                    help="DDL schema of the CSV drops")
    si.add_argument("--sep", default=";")
    si.add_argument("--run-stages", action="store_true",
                    help="run the bounded incremental stages "
                         "(qc/fillup/corr) after each micro-batch")

    cs = wh(sub.add_parser(
        "create-db-schema",
        help="initialize the warehouse for first use (reference cli.py "
             "create-db-schema): pin bucket modulus + layout, handle "
             "pre-existing tables per --if-exists",
    ))
    cs.add_argument("--if-exists", "-e", default=None,
                    choices=["drop", "ignore", "exit"])

    cu = sub.add_parser(
        "create-user-config",
        help="write a commented copy of the engine defaults as a user "
             "config file and record its location (reference cli.py "
             "create-user-config)",
    )
    cu.add_argument("--file", "-f", required=True, dest="config_file")
    cu.add_argument("--on-exists", "-e", default="error",
                    choices=["error", "overwrite", "define"])

    rc = wh(sub.add_parser(
        "update-richter-class",
        help="recompute horizon angles + Richter classes for the "
             "precipitation stations from a DEM grid file (offline tail "
             "of reference cli.py update-richter-class)",
    ))
    rc.add_argument("--dem", required=True,
                    help="ESRI ASCII DEM grid (.asc or .asc.gz), EPSG:25832")
    rc.add_argument("-p", "--parameter", default="p")
    rc.add_argument("--radius-m", type=float, default=75_000.0)
    rc.add_argument("--step-deg", type=float, default=3.0)
    rc.add_argument("--sample-step-m", type=float, default=100.0)

    for ma_name in ("update-ma-timeserie", "update-ma-timeseries"):
        # second spelling = the reference CLI/broker name (broker.py:340)
        ma = wh(sub.add_parser(ma_name, help="A2 yearly MA upsert"))
        ma.add_argument("-p", "--parameter", default="p")

    pm = wh(sub.add_parser(
        "update-period-meta",
        help="write per-kind non-null periods into meta "
             "(reference update_period_meta)",
    ))
    pm.add_argument("-p", "--parameter", default="p")

    for mr_name in ("ingest-ma-rasters", "update-ma-raster"):
        # second spelling = the reference CLI command (cli.py update_ma_raster)
        mr = wh(sub.add_parser(
            mr_name,
            help="sample a directory of downloaded .asc/.asc.gz term grids "
                 "into station_ma_raster (offline tail of the reference's "
                 "download-ma-rasters)",
        ))
        mr.add_argument("--dir", required=True, dest="raster_dir")
        mr.add_argument("-p", "--parameter", default="p")

    dl = sub.add_parser(
        "download-ma-rasters",
        help="fetch the published multi-annual raster files from Zenodo "
             "(reference cli.py download_ma_rasters; NETWORK — offline "
             "environments use ingest-ma-rasters on pre-downloaded grids)",
    )
    dl.add_argument("--out-dir", required=True)
    dl.add_argument("--which", nargs="+", default=["dwd", "hyras", "regnie"])
    dl.add_argument("--overwrite", action="store_true")

    dd = sub.add_parser(
        "download-dem",
        help="fetch + mosaic the newest Copernicus DEM (reference cli.py "
             "download_dem; NETWORK + rasterio — offline environments "
             "pass a pre-downloaded .asc DEM to update-richter-class)",
    )
    dd.add_argument("--out-dir", required=True)
    dd.add_argument("--extent", nargs=4, type=float,
                    default=[5.3, 46.1, 15.6, 55.4],
                    metavar=("MINLON", "MINLAT", "MAXLON", "MAXLAT"))
    dd.add_argument("--overwrite", action="store_true")

    ci = sub.add_parser(
        "check-ivf-index",
        help="IVF serving-index drift check: rebuild recommended when "
             "the top cell's share exceeds --max-top-share (default "
             "4/n_cells); prints one JSON line",
    )
    ci.add_argument("--index-path", required=True)
    ci.add_argument("--max-top-share", type=float, default=None)

    cv = sub.add_parser(
        "compact-ivf-index",
        help="fold the per-cell small files appends accumulate "
             "(row-identical probes; reclaims superseded snapshots)",
    )
    cv.add_argument("--index-path", required=True)

    ct = wh(sub.add_parser("create-ts", help="export station timeseries CSVs"))
    ct.add_argument("--stations", nargs="+", type=int, required=True)
    ct.add_argument("--out-dir", required=True)
    ct.add_argument("--parameters", nargs="+", default=["p"])
    ct.add_argument("--kind", default="best")

    rt = wh(sub.add_parser(
        "create-roger-ts",
        help="export in the RoGeR presets (GroupStation.py:347-432)",
    ))
    rt.add_argument("--stations", nargs="+", type=int, required=True)
    rt.add_argument("--out-dir", required=True)
    rt.add_argument("--kind", default="best")
    rt.add_argument("--toolbox-format", action="store_true",
                    help="PREC/TA/PET.txt with YYYY/MM/DD/hh/mm columns")

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    # configure the package logger from the [logging] user config before
    # any work runs (the reference sets its handlers up on import,
    # utils/logging.py:126-135; the engine defers to CLI entry so library
    # embedders keep full control of logging)
    from weatherdb_spark.logconfig import setup_logging_handlers

    setup_logging_handlers()

    if args.command == "create-user-config":
        # config-only: no warehouse, no SparkSession
        from weatherdb_spark.userconfig import create_user_config

        print(create_user_config(args.config_file, on_exists=args.on_exists))
        return 0

    if args.command == "download-ma-rasters":
        # acquisition-only: no warehouse, no SparkSession (network-gated)
        from weatherdb_spark.sources.rasters import download_ma_rasters

        written = download_ma_rasters(
            args.out_dir, which=tuple(args.which), overwrite=args.overwrite,
        )
        print([str(p) for p in written])
        return 0

    if args.command == "download-dem":
        from weatherdb_spark.sources.rasters import download_dem

        print(str(download_dem(
            args.out_dir, extent=tuple(args.extent),
            overwrite=args.overwrite,
        )))
        return 0

    from weatherdb_spark.broker import Broker
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name=f"weatherdb_spark_cli_{args.command}")

    if args.command == "check-ivf-index":
        # serving-index maintenance: its own warehouse at --index-path
        import json as _json

        from weatherdb_spark.llm.similarity import check_ivf_index

        print(_json.dumps(check_ivf_index(
            spark, args.index_path, max_top_share=args.max_top_share)))
        return 0

    if args.command == "compact-ivf-index":
        import json as _json

        from weatherdb_spark.llm.similarity import compact_ivf_index

        # same machine-readable shape as check-ivf-index (tuples ->
        # lists so the line parses as JSON)
        res = compact_ivf_index(spark, args.index_path)
        print(_json.dumps({t: list(v) for t, v in res.items()}))
        return 0

    broker = Broker(spark, args.warehouse)

    if args.command == "update-db":
        broker.quality_check()
        broker.fillup()
        broker.richter_correct_stage()
    elif args.command == "quality-check":
        broker.quality_check(stids=args.stations)
    elif args.command == "fillup":
        broker.fillup(stids=args.stations)
    elif args.command == "richter-correct":
        broker.richter_correct_stage(stids=args.stations)
    elif args.command == "last-imp-quality-check":
        broker.last_imp_quality_check()
    elif args.command == "last-imp-fillup":
        broker.last_imp_fillup()
    elif args.command == "last-imp-corr":
        broker.last_imp_corr()
    elif args.command == "versions":
        tables = ([args.table] if args.table
                  else broker._data_tables())
        out = {t: broker.table_versions(t) for t in tables}
        print({t: v for t, v in out.items() if v})
    elif args.command == "stream-import":
        from weatherdb_spark.streaming.ingest import stream_into_broker

        stream_into_broker(
            spark, args.stream_dir, broker, args.parameter,
            args.checkpoint, schema=args.schema, sep=args.sep,
            run_stages=args.run_stages,
        )
    elif args.command == "vacuum":
        if args.retention is not None:
            broker.snapshot_retention = args.retention
        print(broker.vacuum())
    elif args.command == "force-deactivate":
        broker.force_deactivate_all()
    elif args.command == "upgrade-db-schema":
        broker.upgrade_db_schema()
    elif args.command == "downgrade-db-schema":
        broker.downgrade_db_schema()
    elif args.command == "set-db-version":
        broker.set_db_version()
        print(broker.get_db_version())
    elif args.command == "update-meta":
        from functools import reduce

        from weatherdb_spark.sources.dwd import meta_from_dwd, read_meta_txt

        parsed = read_meta_txt(spark, args.meta_file)
        frames = [meta_from_dwd(parsed, p) for p in args.parameters]
        broker.upsert_meta(reduce(lambda a, b: a.unionByName(b), frames))
        print({"meta_rows": broker.read("meta").count()})
    elif args.command == "update-raw":
        from weatherdb_spark.sources.dwd import ingest_raw_dir

        raw = ingest_raw_dir(spark, args.parameter, args.raw_dir)
        if args.incremental:
            broker.append_raw(args.parameter, raw)
        else:
            broker.update_raw(args.parameter, raw)
        print({"raw_rows": broker.read(f"ts_{args.parameter}").count()})
    elif args.command == "sql":
        df = broker.sql(args.query)
        if args.csv:
            import csv

            w = csv.writer(sys.stdout)
            w.writerow(df.columns)
            # toLocalIterator pulls one partition at a time — a SELECT *
            # over a big fact table streams instead of collect()ing into
            # driver memory
            for row in df.toLocalIterator():
                w.writerow(row)
        else:
            df.show(args.limit, truncate=False)
    elif args.command == "create-db-schema":
        broker.create_db_schema(if_exists=args.if_exists)
        print({"warehouse": args.warehouse,
               "n_station_buckets": broker.bucket_count,
               "layout": broker.get_setting("layout")})
    elif args.command == "update-richter-class":
        from pyspark.sql import functions as F

        from weatherdb_spark.sources.rasters import dem_sampler_from_grid

        broker.update_horizon(
            dem_sampler_from_grid(args.dem), args.parameter,
            radius_m=args.radius_m, step_deg=args.step_deg,
            sample_step_m=args.sample_step_m,
        )
        print(
            broker.read("meta")
            .filter(F.col("parameter") == args.parameter)
            .groupBy("richter_class").count().toPandas().to_dict("records")
        )
    elif args.command in ("update-ma-timeserie", "update-ma-timeseries"):
        broker.update_ma_timeserie(args.parameter)
    elif args.command == "update-period-meta":
        broker.update_period_meta(args.parameter)
    elif args.command in ("ingest-ma-rasters", "update-ma-raster"):
        from weatherdb_spark.sources.rasters import ingest_ma_raster_dir

        names, geometry = ingest_ma_raster_dir(
            broker, args.parameter, args.raster_dir
        )
        print({"ingested": names, "grid": geometry})
    elif args.command == "create-ts":
        from weatherdb_spark.station import GroupStations

        tele = GroupStations(broker).create_ts(
            args.stations, args.out_dir,
            parameters=tuple(args.parameters), kind=args.kind,
        )
        print(tele)
    elif args.command == "create-roger-ts":
        from weatherdb_spark.station import GroupStations

        tele = GroupStations(broker).create_roger_ts(
            args.stations, args.out_dir, kind=args.kind,
            do_toolbox_format=args.toolbox_format,
        )
        print(tele)
    return 0


def safe_entry(argv: list[str] | None = None) -> int:
    """Console-script entry that reports errors as one red line instead
    of a traceback (reference cli.py:42-50 safe_entry); ``-v``/
    ``--verbose`` anywhere in the argv re-raises for debugging."""
    args = sys.argv[1:] if argv is None else argv
    try:
        return main(argv)
    except Exception as e:  # noqa: BLE001 - the entry point's catch-all
        if "-v" in args or "--verbose" in args:
            raise
        notes = (
            "\n" + "\n".join(e.__notes__) if hasattr(e, "__notes__") else ""
        )
        print(
            f"\033[31;1;4mAn error occurred: {e}{notes}\033[0m",
            file=sys.stderr,
        )
        return 1


if __name__ == "__main__":
    sys.exit(safe_entry())
