#!/usr/bin/env python
"""Profile one registry query: wall time, Spark job count, and per-job
stage/task shape. Usage::

    python tools/profile_query.py fillup_median_deep [--sf /root/testdata/sf0.1] [--iters 1]

Job counting uses ``setJobGroup`` + ``statusTracker().getJobIdsForGroup``:
every action (count/isEmpty/first probe, persist materialization, the final
noop write) shows up as its own job, so a query that should be "one write"
but launches six jobs is immediately visible — the Spark-UI-less twin of
reading the UI's job list.
"""

from __future__ import annotations

import argparse
import json
import time


def profile(name: str, sf_dir: str, iters: int) -> dict:
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY
    from weatherdb_spark.session import get_spark

    spec = {**REGISTRY, **EXTRA_REGISTRY}[name]
    spark = get_spark(app_name=f"profile_{name}")
    sc = spark.sparkContext
    # warmup for JVM / parquet footers
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    runs = []
    for i in range(iters):
        group = f"profile_{name}_{i}"
        sc.setJobGroup(group, name, interruptOnCancel=False)
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        jobs = sorted(tracker.getJobIdsForGroup(group))
        job_rows = []
        for jid in jobs:
            jinfo = tracker.getJobInfo(jid)
            stages = []
            for sid in sorted(jinfo.stageIds):
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                stages.append({"stage": sid, "tasks": sinfo.numTasks,
                               "name": sinfo.name.split("\n")[0][:80]})
            job_rows.append({"job": jid, "stages": stages})
        runs.append({"wall_sec": round(wall, 3), "n_jobs": len(jobs),
                     "jobs": job_rows})
        spark.catalog.clearCache()
    return {"query": name, "sf_dir": sf_dir, "runs": runs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=1)
    args = ap.parse_args()
    out = profile(args.query, args.sf, args.iters)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
