#!/usr/bin/env python
"""Interleaved A/B: AQE on cached plans
(spark.sql.optimizer.canChangeCachedPlanOutputPartitioning) across the
bench query set.

The repo's operators scoped_persist their shared intermediates; with
the conf at its default (false) every cached plan keeps the raw
spark.sql.shuffle.partitions output partitioning, so batch-sized cached
frames materialize and are consumed as 32-task stages. With the conf
on, AQE's partition coalescing applies to the cached plan too — the
task count follows the ACTUAL bytes (advisoryPartitionSizeInBytes), so
the setting is scale-adaptive rather than a local[32] constant.

Methodology per the repo's measurement rules: both arms run in ONE
process, alternating A B A B per iteration (the conf is a dynamic SQL
conf read when a plan is cached, and every iteration runs under its own
cache_scope, so each iteration re-caches under its own setting). Row
counts are asserted identical per arm before timings are trusted.

Usage: python tools/ab_cached_aqe.py [--iters 4] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4,
                    help="iterations PER ARM (interleaved)")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from weatherdb_spark.functions.caching import cache_scope
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="ab_cached_aqe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {n: s for n, s in {**REGISTRY, **EXTRA_REGISTRY}.items() if s.bench}
    if args.queries:
        specs = {n: specs[n] for n in args.queries.split(",")}
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    results: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        timings = {"off": [], "on": []}
        rows = {"off": set(), "on": set()}
        # warmup (codegen/JIT) outside the timed arms, default conf
        spark.conf.set(CONF, "false")
        with cache_scope():
            spec.spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        spark.catalog.clearCache()
        order = ["off", "on", "on", "off"]  # alternate arm order per pair
        for i in range(args.iters):
            for arm in (order if i % 2 == 0 else order[::-1])[:2]:
                spark.conf.set(CONF, "true" if arm == "on" else "false")
                t0 = time.perf_counter()
                with cache_scope():
                    df = spec.spark_fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                timings[arm].append(round(time.perf_counter() - t0, 3))
                # output identity probe: once per arm, and not for the
                # stateful append entry (it mutates its archive per
                # call; its own admitted/rejected notes pin identity)
                if i == 0 and name != "corpus_append_bench":
                    with cache_scope():
                        rows[arm].add(spec.spark_fn(spark, sf_dir).count())
                spark.catalog.clearCache()
        spark.conf.set(CONF, "false")
        assert rows["off"] == rows["on"], (name, rows)
        results[name] = {
            "off_min": min(timings["off"]), "on_min": min(timings["on"]),
            "off": timings["off"], "on": timings["on"],
            "rows": sorted(rows["on"]),
        }
        print(json.dumps({name: results[name]}), flush=True)

    tot_off = sum(r["off_min"] for r in results.values())
    tot_on = sum(r["on_min"] for r in results.values())
    print(json.dumps({"total_off_min": round(tot_off, 3),
                      "total_on_min": round(tot_on, 3),
                      "load": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
