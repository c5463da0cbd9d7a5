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
    # min-of-4: on this shared sandbox iteration 1 pays cold parquet/page
    # cache and iteration 2 still pays per-plan codegen compilation; the
    # steady state usually shows from the third run (measured on
    # fillup_median_deep: 15.0 / 11.5 / 8.6 s) but a full 14-query bench
    # sometimes needs a fourth (same two queries measured flat-high for
    # 3 in-bench iterations, then 21.1/11.6/11.5/11.4 and
    # 11.2/5.7/4.6/4.4 in an isolated 4-iteration probe)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "4"))
    from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY
    from weatherdb_spark.session import get_spark

    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="weatherdb_spark_bench")

    # bench set spans both registries so the headline query list stays
    # stable across rounds even when an entry moves to EXTRA
    bench_specs = {
        n: s for n, s in {**REGISTRY, **EXTRA_REGISTRY}.items() if s.bench
    }
    # warmup: JVM + parquet footer caches, tiny plan
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # min-of-N per query: a single cold shot on a shared box conflates
    # sandbox contention with plan cost (round-2's 4x phantom regression)
    timings: dict[str, float] = {}
    iterations: dict[str, list[float]] = {}
    from weatherdb_spark.functions.caching import cache_scope

    # convergence guard: if the LAST iteration is still >15% above the
    # min, the query hasn't reached steady state (JVM JIT / codegen /
    # page cache) — allow up to 2 extra iterations so a one-shot record
    # isn't taken off a still-falling curve
    max_extra = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "2"))
    for name, spec in sorted(bench_specs.items()):
        runs = []
        while True:
            t0 = time.perf_counter()
            # scope releases the query's scoped_persist intermediates the
            # way a long-lived session would; clearCache below stays as the
            # backstop for anything persisted outside the scope
            with cache_scope():
                df = spec.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            if len(runs) < max(1, iters):
                continue
            if len(runs) >= max(1, iters) + max_extra:
                break
            # converged = the last run neither improved the best by >5%
            # (curve still falling — comparing against min(runs) would
            # let a fresh min trivially pass) nor sits >15% above it
            # (not settled, likely a noise spike worth one more look)
            prev_min = min(runs[:-1]) if len(runs) > 1 else runs[-1]
            still_falling = runs[-1] < 0.95 * prev_min
            still_high = runs[-1] > 1.15 * min(runs)
            if not still_falling and not still_high:
                break
        iterations[name] = runs
        timings[name] = min(runs)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # stateful bench entries (corpus_append_bench) stamp what each
    # iteration measured into this side-channel — recorded so a
    # round-over-round diff of a non-stationary series compares
    # like with like
    from weatherdb_spark.plans.llm_queries import BENCH_NOTES
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "iterations": iterations,
        **({"notes": BENCH_NOTES} if BENCH_NOTES else {}),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # this sandbox shares hardware; wall times drift up to ~3x with
        # neighbor load, so the record carries the host 1-min load for
        # cross-round interpretation (see STRESS.json's A/B note)
        "load_1min_start": load_start,
        "load_1min_end": round(os.getloadavg()[0], 2),
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
