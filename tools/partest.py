#!/usr/bin/env python
"""Parallel test runner: shard test FILES across N pytest processes,
each with its own smaller SparkSession (SPARK_GRAFT_CPUS=cores/N).

The suite is e2e-heavy by design (warehouse builds, full pipeline
replays) and pytest-xdist is not available in this environment, so this
is the poor-man's equivalent: file-level sharding keeps every module's
session/module fixtures intact, and separate processes parallelize the
driver-side work (plan build, codegen, py4j) that a single SparkSession
serializes no matter how many executor threads it has.

Shards are balanced by measured per-file wall weights (from a
--durations profile; unknown files get a default) using greedy
longest-processing-time assignment.

Usage: python tools/partest.py [n_workers | --workers N]   (default 4)
Exit code is non-zero if any shard fails; per-shard tails print on
failure. Measured on a calm window: 25:03 sequential -> ~8 min at 4
workers (the longest shard dominates).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

# approximate per-file wall seconds from a calm sequential --durations
# profile (round 6; the LLM files re-weighted from the round-8 shard
# walls after test_llm_packing at the 15-s default put a 14:31 shard
# next to 3:06 ones); only the RATIOS matter for balancing
WEIGHTS = {
    "test_scoped_stages.py": 130,
    "test_fillup_deep.py": 150,
    "test_incremental.py": 160,
    "test_property_equivalence.py": 150,
    "test_ingest.py": 110,
    "test_station_stages.py": 80,
    "test_oracle_parity.py": 250,
    "test_facade.py": 70,
    "test_e2e_pipeline.py": 60,
    "test_cli_ingest.py": 50,
    "test_plan_quality.py": 60,
    "test_property_sinks_census.py": 40,
    "test_broker_versioning.py": 40,
    "test_broker_maintenance.py": 40,
    "test_ann_recall_sweep.py": 60,
    "test_bucket_caps.py": 50,
    "test_weather_ops.py": 30,
    "test_review_fixes.py": 60,
    # round 9: the corpus-store tests split out of test_llm_packing
    # (the 18:50 shard-0 critical path of the round-8 judge run was
    # that ONE file); the two halves now shard independently
    "test_llm_packing.py": 160,
    "test_corpus_store.py": 200,
    "test_llm_similarity.py": 200,
    "test_mvcc_concurrency.py": 120,
    "test_multimodal.py": 30,
    "test_advice_r8.py": 40,
}
DEFAULT_WEIGHT = 15


def shard(files: list[str], n: int) -> list[list[str]]:
    """Greedy LPT: heaviest file onto the lightest shard."""
    weighted = sorted(
        files,
        key=lambda f: WEIGHTS.get(os.path.basename(f), DEFAULT_WEIGHT),
        reverse=True,
    )
    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in weighted:
        w = WEIGHTS.get(os.path.basename(f), DEFAULT_WEIGHT)
        i = min(range(n), key=lambda j: shards[j][0])
        shards[i] = (shards[i][0] + w, shards[i][1] + [f])
    return [s[1] for s in shards if s[1]]


def parse_workers(argv: list[str]) -> int:
    """Accept both spellings: ``partest.py 6`` and ``partest.py
    --workers 6`` (``--workers=6`` too) — the flag form used to crash
    on ``int('--workers')``."""
    args = argv[1:]
    if not args:
        return 4
    if args[0] in ("-w", "--workers"):
        if len(args) < 2:
            raise SystemExit("--workers needs a value, e.g. --workers 6")
        return int(args[1])
    if args[0].startswith("--workers="):
        return int(args[0].split("=", 1)[1])
    return int(args[0])


def main() -> int:
    n = parse_workers(sys.argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "tests", "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per_worker = max(2, total_cpus // n)

    procs = []
    t0 = time.time()
    for i, group in enumerate(shard(files, n)):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(per_worker)
        # keep N concurrent drivers inside the box's memory
        env.setdefault("SPARK_DRIVER_MEMORY", "8g")
        log = tempfile.NamedTemporaryFile(
            "w", prefix=f"partest_{i}_", suffix=".log", delete=False
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *group],
            cwd=repo, env=env, stdout=log, stderr=subprocess.STDOUT,
        )
        procs.append((i, p, log.name, group))
        print(f"shard {i}: {len(group)} files -> {log.name}")

    rc = 0
    for i, p, logname, group in procs:
        code = p.wait()
        with open(logname) as fh:
            tail = fh.readlines()[-3:]
        status = "ok" if code == 0 else f"FAILED rc={code}"
        print(f"shard {i} {status} ({time.time() - t0:.0f}s): "
              + "".join(tail).strip().replace("\n", " | "))
        if code != 0:
            rc = 1
            print(f"  files: {[os.path.basename(f) for f in group]}")
    print(f"total wall: {time.time() - t0:.0f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
