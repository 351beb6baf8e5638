#!/usr/bin/env python
"""Round-8 side benchmarks — the frozen ``bench.py`` stays the record of
truth; this file exists for (a) timing a SUBSET of entries while
iterating (same session shape, same best-of-N + cache-isolation
methodology) and (b) noop-sink isolation runs (guide §1.4) that time a
query's computation without the count() shortcut.

Usage:
  python bench_extra.py q1 q2 ...          # subset, count() like bench.py
  python bench_extra.py --noop q1 q2 ...   # noop-sink variant
  python bench_extra.py --index-io         # VERDICT r7 #5: measured
      bytesRead of one ingest batch against a ~10x replicated corpus
      index, hash-bucketed layout vs flat — converts the
      O(touched-buckets) ingest I/O claim from plan shape to a
      recorded number (reported in OPTIMIZATION_r08.md)
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


def _stage_input_bytes(ui: str) -> int:
    """Sum of inputBytes over all completed stages of the app (REST)."""
    import urllib.request
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    return sum(s.get("inputBytes", 0) for s in stages)


def index_io_bench() -> None:
    """Build a ~10× sf0.1 index twice (hash-bucketed vs flat layout),
    ingest the same small batch against each, and report the parquet
    bytes actually read per ingest (Spark REST stage metrics). The
    bucketed layout's PartitionFilters prune untouched ``pb``
    directories at listing time, so its per-batch read should be a
    small fraction of the flat layout's full-table scans."""
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    builder = (SparkSession.builder.appName("mre-index-io")
               .master(f"local[{CPUS}]")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.sql.optimizer.excludedRules",
                       "org.apache.spark.sql.catalyst.optimizer."
                       "InferFiltersFromGenerate")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
               .config("spark.sql.execution.arrow.pyspark.enabled",
                       "true")
               .config("spark.ui.enabled", "true")   # REST metrics
               .config("spark.driver.memory",
                       os.environ.get("MRE_DRIVER_MEM", "16g")))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.split(':')[-1]}"
    from mre.curate import build_dedup_index, dedup_increment
    from mre.textops import release_caches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = 10
    big = None
    for i in range(rep):
        part = docs.select(
            (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"))
        big = part if big is None else big.unionAll(part)
    big = big.localCheckpoint(eager=True)
    n_big = big.count()
    batch = (docs.limit(400)
             .select((F.col("doc_id") + F.lit(9_900_000_000)).alias(
                 "doc_id"),
                 F.concat(F.col("text"), F.lit(" fresh")).alias("text"))
             .localCheckpoint(eager=True))
    batch.count()

    out = {"index_docs": n_big, "batch_docs": 400, "sf": SF_DIR}
    for name, parts in (("bucketed", 32), ("flat", None)):
        idx = tempfile.mkdtemp(prefix=f"mre_idxio_{name}_")
        spark.sparkContext.setJobDescription(f"build {name} index")
        build_dedup_index(spark, big, idx, parts=parts)
        for r in range(2):   # run 2: warm listings, steady state
            release_caches()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(
                f"ingest vs {name} index (run {r})")
            b0 = _stage_input_bytes(ui)
            t0 = time.perf_counter()
            n = dedup_increment(spark, batch, idx, threshold=0.5,
                                update_index=False).count()
            dt = round(time.perf_counter() - t0, 3)
            bytes_read = _stage_input_bytes(ui) - b0
            out[f"{name}_run{r}"] = {"bytes_read": bytes_read,
                                     "sec": dt, "survivors": n}
    out["prune_ratio_run1"] = round(
        out["flat_run1"]["bytes_read"]
        / max(out["bucketed_run1"]["bytes_read"], 1), 2)
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    if "--index-io" in sys.argv:
        index_io_bench()
        return
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
