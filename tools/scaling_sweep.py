"""Measure how the bench queries scale across the sf0.001/0.01/0.1
datasets and report a per-query scaling exponent.

Usage: python tools/scaling_sweep.py [--iters N] [--queries a b c]

For each bench-flagged registry query the sweep runs min-of-N wall time
at every scale factor and reports

- the raw seconds per SF,
- ``slope``: the log-log slope between the two LARGEST scale factors
  (the most overhead-free decade) — ~1.0 means linear scaling in the
  data volume, <1 means fixed overhead still dominates, >1 flags
  super-linear growth worth a plan audit before a real 100x scale-up.

Small-SF timings are floored by per-job fixed overhead (~0.3-0.5 s in
local mode), so exponents are indicative, not load-test numbers: the
point is to catch a query whose cost grows like the SQUARE of its
input while it still only costs seconds.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weatherdb_spark.plans.registry import EXTRA_REGISTRY, REGISTRY  # noqa: E402
from weatherdb_spark.session import get_spark  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--sf-dirs", nargs="*", default=SF_DIRS)
    args = ap.parse_args()

    specs = {n: s for n, s in {**REGISTRY, **EXTRA_REGISTRY}.items() if s.bench}
    if args.queries:
        specs = {n: s for n, s in specs.items() if n in args.queries}

    spark = get_spark(app_name="weatherdb_spark_scaling")
    report: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        times: list[float] = []
        for sf_dir in args.sf_dirs:
            runs = []
            for _ in range(max(1, args.iters)):
                t0 = time.perf_counter()
                spec.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            times.append(min(runs))
        def _sf(d: str, i: int) -> float:
            tail = d.rstrip("/").rsplit("sf", 1)[-1]
            try:
                return float(tail)
            except ValueError:  # non-standard dir name: label by position
                return float(10 ** i)

        sfs = [_sf(d, i) for i, d in enumerate(args.sf_dirs)]
        slope = (
            math.log(times[-1] / times[-2]) / math.log(sfs[-1] / sfs[-2])
            if len(times) >= 2 and times[-2] > 0 and sfs[-1] != sfs[-2]
            else None
        )
        report[name] = {
            "sf": sfs,
            "sec": [round(t, 3) for t in times],
            "slope": round(slope, 2) if slope is not None else None,
        }
        print(
            f"{name:32s} "
            + "  ".join(f"sf{s}={t:7.3f}s" for s, t in zip(sfs, report[name]["sec"]))
            + f"  slope={report[name]['slope']}",
            flush=True,
        )

    print(json.dumps({"metric": "scaling_sweep", "queries": report}))


if __name__ == "__main__":
    main()
