"""Run registry queries through a driver-like pandas compare.

Usage: python tools/check_query.py [--sf DIR] name [name ...]

Stricter than tests/test_oracle_parity.py: pulls the oracle result through
pandas (the driver's path), so DuckDB HUGEINT->float64 and similar dtype
artifacts that survive fetchall() are caught here.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY  # noqa: E402

ALL_SPECS = {**REGISTRY, **EXTRA_REGISTRY}
from weatherdb_spark.session import get_spark  # noqa: E402
from weatherdb_spark.sources.testdata import TABLES  # noqa: E402


def _norm_cell(v):
    import datetime

    import pandas as pd

    if v is None:
        return "None"
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        # pandas renders DuckDB DATE as datetime64 midnight while Spark
        # dates stay datetime.date — normalize both to one form
        return str(pd.Timestamp(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)


def _norm(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failed = []
    for name in args.names:
        spec = ALL_SPECS[name]
        sdf = spec.spark_fn(spark, args.sf).toPandas()
        if spec.oracle is None:
            print(f"{name}: no_oracle spark_rows={len(sdf)}")
            continue
        odf = con.execute(spec.oracle).df()
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        scols, srows = _norm(sdf)
        ocols, orows = _norm(odf)
        ok_schema = scols == ocols
        ok_rows = len(srows) == len(orows)
        ok_hash = srows == orows
        status = "PASS" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} schema={ok_schema} hash={ok_hash}")
        if not ok_hash and ok_rows:
            for a, b in zip(srows, orows):
                if a != b:
                    print("  first diff spark :", a)
                    print("  first diff oracle:", b)
                    break
        if status == "FAIL":
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
