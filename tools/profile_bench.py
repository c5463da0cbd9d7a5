#!/usr/bin/env python
"""Per-query profiling for the bench set: wall seconds, Spark job count,
stage count, task count, and shuffle bytes for ONE execution of each
bench-flagged query, plus the formatted plan written to plans/r09/.

Usage:
    python tools/profile_bench.py [--queries a,b,c] [--suffix before]
        [--iters 2]

The job/stage/task counts come from a SparkListener; at sf0.1 the tables
are tiny, so wall time is dominated by per-job fixed overhead — job and
stage counts are the structural signal the optimization rounds steer by
(guide section 1: measure first).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: all bench)")
    ap.add_argument("--suffix", default=None,
                    help="write plans/r09/<name>_<suffix>.txt explains")
    ap.add_argument("--iters", type=int, default=2,
                    help="timed iterations per query (min is reported)")
    ap.add_argument("--plandir", default="r10",
                    help="plans/<plandir>/ subdir for --suffix explains")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from weatherdb_spark.functions.caching import cache_scope
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY
    from weatherdb_spark.session import get_spark

    spark = get_spark(app_name="weatherdb_spark_profile")
    sc = spark.sparkContext
    specs = {n: s for n, s in {**REGISTRY, **EXTRA_REGISTRY}.items() if s.bench}
    if args.queries:
        want = args.queries.split(",")
        specs = {n: specs[n] for n in want}
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # job/stage/task counting via the PySpark status tracker: snapshot
    # job ids before and after each run
    out = {}
    plandir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "plans", args.plandir)
    os.makedirs(plandir, exist_ok=True)
    tracker = sc.statusTracker()

    for name, spec in sorted(specs.items()):
        runs = []
        jobs0 = stages0 = tasks0 = None
        for i in range(max(1, args.iters)):
            sc.setJobDescription(f"profile:{name}")
            jobs_before = set(tracker.getJobIdsForGroup())
            t0 = time.perf_counter()
            with cache_scope():
                df = spec.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            new_jobs = set(tracker.getJobIdsForGroup()) - jobs_before
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is not None:
                    for sid in info.stageIds:
                        sinfo = tracker.getStageInfo(sid)
                        if sinfo is not None:
                            n_stages += 1
                            n_tasks += sinfo.numTasks
            runs.append(round(dt, 3))
            if jobs0 is None:
                jobs0, stages0, tasks0 = len(new_jobs), n_stages, n_tasks
            spark.catalog.clearCache()
            sc.setJobDescription(None)
        if args.suffix:
            with cache_scope():
                df = spec.spark_fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
            with open(os.path.join(plandir, f"{name}_{args.suffix}.txt"),
                      "w") as fh:
                fh.write(plan)
        out[name] = {
            "wall_min": min(runs), "runs": runs,
            "jobs": jobs0, "stages": stages0, "tasks": tasks0,
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"profile": out}))


if __name__ == "__main__":
    main()
