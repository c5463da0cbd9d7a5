#!/usr/bin/env python
"""Run ONE bench query with the Spark event log enabled and print a
per-stage wall/task-time breakdown — the poor man's Spark UI for a
sandbox with spark.ui.enabled=false (guide section 7.1: find where the
time actually goes before touching anything).

Usage: python tools/stage_breakdown.py <query> [--iters 2] [--top 25]

The parse reports, per stage: submission->completion wall, summed
executor run time, task count, shuffle read/write bytes, and the
first line of the stage's callsite, grouped under the job that ran it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="sparkev_")
    from weatherdb_spark.functions.caching import cache_scope
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY
    from weatherdb_spark.session import get_spark

    spark = get_spark(
        app_name=f"stagebreak_{args.query}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spec = {**REGISTRY, **EXTRA_REGISTRY}[args.query]
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    walls = []
    for i in range(args.iters):
        spark.sparkContext.setJobDescription(f"iter{i}:{args.query}")
        t0 = time.perf_counter()
        with cache_scope():
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the event log: stages of the LAST iteration only
    jobs = {}        # job_id -> {desc, stages: [ids], submitted, completed}
    stages = {}      # stage_id -> metrics
    last_iter = f"iter{args.iters - 1}:"
    candidates = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and not p.endswith(".inprogress")
        and "appstatus" not in os.path.basename(p)
    ]
    for path in candidates:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", "")
                    jobs[ev["Job ID"]] = {
                        "desc": desc,
                        "stages": [s["Stage ID"]
                                   for s in ev.get("Stage Infos", [])],
                        "t0": ev.get("Submission Time", 0),
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[sid] = {
                        "wall_ms": (comp - sub) if sub and comp else 0,
                        "tasks": si.get("Number of Tasks", 0),
                        "name": si.get("Stage Name", "")[:90],
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(
                        sid, {"wall_ms": 0, "tasks": 0, "name": ""})
                    st["run_ms"] = st.get("run_ms", 0) + m.get(
                        "Executor Run Time", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    swm = m.get("Shuffle Write Metrics") or {}
                    st["sh_read"] = st.get("sh_read", 0) + srm.get(
                        "Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                    st["sh_write"] = st.get("sh_write", 0) + swm.get(
                        "Shuffle Bytes Written", 0)

    picked = {jid: j for jid, j in jobs.items()
              if j["desc"].startswith(last_iter)}
    print(f"walls: {walls}")
    print(f"jobs in last iteration: {len(picked)}")
    rows = []
    for jid, j in sorted(picked.items()):
        jwall = (j.get("t1", 0) - j.get("t0", 0))
        site = ""
        for sid in j["stages"]:
            st = stages.get(sid)
            if st and st.get("name"):
                site = st["name"][:70]
        print(f"job {jid}: {jwall} ms, {len(j['stages'])} stages  {site}")
        for sid in j["stages"]:
            st = stages.get(sid)
            if st is None or "wall_ms" not in st:
                continue  # skipped stage (reused exchange)
            rows.append((st["wall_ms"], jid, sid, st))
    rows.sort(reverse=True)
    print(f"\ntop {args.top} stages by wall:")
    for wall, jid, sid, st in rows[: args.top]:
        print(
            f"  {wall:7d} ms wall {st.get('run_ms', 0):7d} ms cpu "
            f"{st.get('tasks', 0):5d} tasks "
            f"shR={st.get('sh_read', 0) >> 10}K shW={st.get('sh_write', 0) >> 10}K "
            f"job={jid} stage={sid} {st.get('name', '')}"
        )
    total_wall = sum(r[0] for r in rows)
    print(f"\nsummed stage wall: {total_wall} ms across {len(rows)} stages")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
