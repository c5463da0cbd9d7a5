#!/usr/bin/env python
"""Interleaved A/B of the r4 vs r5 multimodal decode path.

BENCH_r05 recorded multimodal_decode at 4.87 s vs 0.53 s in r4 — but the
record also stamped host load 16.5/32 cpus, and the only r4->r5 diff to
``llm/multimodal.py`` is NULL-safety (``len(payload) if payload is not
None else 0`` and two ``b or b""`` fallbacks), which cannot plausibly
cost 9x. STRESS.json's methodology note: apparent cross-round drift is
settled by a BACK-TO-BACK A/B of the two implementations on identical
data in one process — alternating A B A B so sandbox weather hits both
sides equally.

Usage: python tools/ab_multimodal.py [iters]   (default 4 per side)
Prints one JSON line: min/median per side + the host load.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

# runnable as `python tools/ab_multimodal.py` (sys.path[0] is tools/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r4_ref = os.environ.get("SPARK_GRAFT_AB_BASE", "471958d")

    # materialize the r4 implementation as an importable sibling module
    src = subprocess.run(
        ["git", "show", f"{r4_ref}:weatherdb_spark/llm/multimodal.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    import importlib.util
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix="_multimodal_r4.py", delete=False
    ) as fh:
        fh.write(src)
        r4_path = fh.name
    spec = importlib.util.spec_from_file_location("multimodal_r4", r4_path)
    mm_r4 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm_r4)

    from weatherdb_spark.llm import multimodal as mm_r5
    from weatherdb_spark.session import get_spark
    from weatherdb_spark.sources.testdata import load

    spark = get_spark(app_name="ab_multimodal")
    docs = load(spark, sf_dir, "documents")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run(mod) -> float:
        t0 = time.perf_counter()
        decoded = mod.decode_images(mod.attach_binary_payload(docs))
        decoded.select("doc_id", "n_bytes", "width", "height").write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    a, b = [], []
    for _ in range(iters):  # interleave so drift hits both sides
        a.append(run(mm_r4))
        b.append(run(mm_r5))
    os.unlink(r4_path)
    print(json.dumps({
        "metric": "ab_multimodal_decode",
        "sf_dir": sf_dir,
        "r4": {"runs": a, "min": min(a), "median": statistics.median(a)},
        "r5": {"runs": b, "min": min(b), "median": statistics.median(b)},
        "load_1min_end": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
