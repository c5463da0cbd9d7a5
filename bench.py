#!/usr/bin/env python
"""Headline benchmark: run the registry's bench-flagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall seconds.

Each query is forced to full execution with a count-style noop collect
(``df.write.format('noop')``) so the measured time includes the complete
plan, not a limit-k shortcut.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from weatherdb_spark.plans.registry import REGISTRY
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="weatherdb_spark_bench")

    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}
    # warmup: JVM + parquet footer caches, tiny plan
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs.items()):
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # isolate queries: drop persisted intermediates (e.g. the LSH
        # shingle cache) so later queries aren't charged for their memory
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
