#!/usr/bin/env python
"""Round-8 side benchmarks — the frozen ``bench.py`` stays the record of
truth; this file exists for (a) timing a SUBSET of entries while
iterating (same session shape, same best-of-N + cache-isolation
methodology) and (b) noop-sink isolation runs (guide §1.4) that time a
query's computation without the count() shortcut.

Usage:
  python bench_extra.py q1 q2 ...          # subset, count() like bench.py
  python bench_extra.py --noop q1 q2 ...   # noop-sink variant
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    from mre.io import get_spark
    import bench
    import __spark_entry__ as em

    spark = get_spark(app="mre-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    qs = em.queries()
    spark.sparkContext.setJobDescription("warmup")
    qs["extract_flagship"](spark, SF_DIR).count()
    out = {}
    for name in args:
        fn = qs.get(name) or bench.EXTRA_BENCH.get(name)
        runs = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs, "n": n}
        spark.catalog.clearCache()
        from mre.textops import release_caches
        release_caches()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
