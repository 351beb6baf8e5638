"""P1/P7 — source/sink abstraction (SURVEY.md §2B).

Prod target is Iceberg (``spark.read.format("iceberg")`` /
``df.writeTo(tbl).append()``); the sandbox has no Iceberg jars [ENV], so the
same call sites run against parquet directories. The format is decided by
the path string: ``iceberg:db.table`` vs a filesystem path.

Session factory pins the determinism + Arrow configs every component
assumes (UTC session TZ, AQE, capped Arrow batches — SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def get_spark(app: str = "mre", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """SparkSession with the pipeline's standard configs.

    ``master`` default: $MRE_MASTER or local[*]. On a real cluster, leave
    master to spark-submit and call with master=None.
    """
    builder = SparkSession.builder.appName(app)
    master = master or os.environ.get("MRE_MASTER")
    if master:
        builder = builder.master(master)
    cores = os.cpu_count() or 8
    builder = (
        builder
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate infers size(child)>0/isnotnull(child)
        # filters under every explode; predicate pushdown then INLINES the
        # whole generator expression (shingle transforms and all) into an
        # interpreted Filter evaluated per row — measured 16x slowdown on
        # the n-gram ops (26s → 1.6s for contamination at sf0.1). Our
        # generate inputs always carry explicit size filters, so the
        # inferred ones only duplicate work.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or max(32, cores)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # HTML rows are huge — cap rows per Arrow batch; the extract UDF
        # additionally re-chunks by bytes (SURVEY.md §4.3)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("MRE_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_FORMAT_PREFIXES = ("orc:", "csv:", "json:")


def read_pages(spark: SparkSession, src: str) -> DataFrame:
    """P1 scan. ``src``: parquet path (file or dir, the default),
    ``iceberg:db.table``, ``warc:`` + a WARC(.gz) path/glob (crawl-native,
    carries the HTTP Content-Type through to the decoder),
    ``jsonl:`` + a JSONL path (html as base64), or ``orc:``/``csv:``/
    ``json:`` + path for the other formats Spark reads natively — every
    source is reachable from the spark-submit CLI via this one dispatch."""
    if src.startswith(ICEBERG_PREFIX):
        return spark.read.format("iceberg").load(src[len(ICEBERG_PREFIX):])
    if src.startswith("warc:"):
        from .sources.warc import read_warc
        return read_warc(spark, src[len("warc:"):])
    if src.startswith("wet:"):
        # Common Crawl's extracted-text distribution → the DOCUMENTS
        # shape (doc_id, url, warc_ts, text, lang, source, n_chars):
        # feed it to run_curate / the textops, not to run_extract —
        # the HTML extract stage is already done upstream
        from .sources.warc import wet_documents
        return wet_documents(spark, src[len("wet:"):])
    if src.startswith("sitemap:"):
        # sitemaps.org urlset / sitemapindex files — crawl discovery
        from .sources.sitemap import read_sitemaps
        return read_sitemaps(spark, src[len("sitemap:"):])
    if src.startswith("feed:"):
        # RSS 2.0 / Atom feeds — news-pipeline discovery
        from .sources.sitemap import read_feeds
        return read_feeds(spark, src[len("feed:"):])
    if src.startswith("cdx:"):
        # Common Crawl's capture-index distribution (CDXJ shards) —
        # membership / freshness / re-crawl planning without payload
        # bytes; see mre/sources/cdx.py capture_delta
        from .sources.cdx import read_cdx
        return read_cdx(spark, src[len("cdx:"):])
    if src.startswith("jsonl:"):
        return read_pages_jsonl(spark, src[len("jsonl:"):])
    for p in _FORMAT_PREFIXES:
        if src.startswith(p):
            fmt = p[:-1]
            reader = spark.read
            if fmt == "csv":
                reader = reader.option("header", "true")
            return reader.format(fmt).load(src[len(p):])
    return spark.read.parquet(src)


def write_append(df: DataFrame, dst: str,
                 partition_col: str | None = None) -> None:
    """P7 sink, append semantics (idempotence is handled one level up by
    the lineage/resume protocol — pipeline.run_extract). With
    ``partition_col``, appended rows land in the matching hash-bucket
    directories of a partitioned layout (the dedup-index tables use this
    so ingest can statically prune to touched buckets)."""
    if dst.startswith(ICEBERG_PREFIX):
        # Iceberg owns layout at the table level — partitioning was
        # declared at create time, appends inherit it
        df.writeTo(dst[len(ICEBERG_PREFIX):]).append()
    else:
        w = df.write.mode("append")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(dst)


def write_overwrite(df: DataFrame, dst: str,
                    partition_col: str | None = None) -> None:
    """P7 sink, full-overwrite semantics, same ``iceberg:`` dispatch as
    every other writer — raw ``df.write.parquet(dst)`` on an iceberg:
    URI would hand Hadoop a bogus filesystem scheme."""
    if dst.startswith(ICEBERG_PREFIX):
        w = df.writeTo(dst[len(ICEBERG_PREFIX):])
        if partition_col is not None:
            from pyspark.sql import functions as F
            w = w.partitionedBy(F.col(partition_col))
        w.createOrReplace()
    else:
        w = df.write.mode("overwrite")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(dst)


def write_overwrite_partitions(df: DataFrame, dst: str,
                               partition_col: str) -> None:
    """P7 sink, dynamic-partition-overwrite semantics (idempotent re-write
    of exactly the partitions present in ``df``). Iceberg target must be
    partitioned by ``partition_col``."""
    if dst.startswith(ICEBERG_PREFIX):
        df.writeTo(dst[len(ICEBERG_PREFIX):]).overwritePartitions()
    else:
        (df.write
         .mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(partition_col)
         .parquet(dst))


def compact_partitions(spark: SparkSession, path: str, partition_col: str,
                       max_files_per_partition: int = 1) -> None:
    """Small-file compaction for a partitioned parquet sink — the
    maintenance job every long-running 100 TB pipeline needs (each
    incremental/resumed run appends files; thousands of KB-sized files
    per partition destroy scan throughput and driver planning time).

    Rewrites each partition into ≤ ``max_files_per_partition`` files and
    dynamic-partition-overwrites it — content is byte-preserved, layout
    is not (tested via golden_diff == 0). With the default N=1 the
    repartition key is the partition column alone (one task, one file
    per partition value). With N>1 a within-partition salt joins the
    key — repartitioning on the partition column alone would hash every
    row of a partition value to ONE task regardless of the multiplier
    (ADVICE r3: the knob was ineffective), so large partitions could
    never regain write parallelism. The salt is a DETERMINISTIC hash of
    the full row content (ADVICE r4: a nondeterministic per-row id —
    monotonically_increasing_id — re-evaluates differently under task
    retry / shuffle-fetch recomputation, hashing rows to different
    reducers than the original attempt and silently duplicating or
    dropping them — the SPARK-23207 class of bug; the round-robin sort
    fix does not protect arbitrary nondeterministic keys). Content
    hashing gives ≤N files per partition value and ~N tasks in flight;
    identical rows co-locate in one file, which is harmless for
    compaction (content, not layout, is the contract).
    On Iceberg this maps to rewrite_data_files; the parquet path keeps
    the same semantics for the sandbox."""
    from pyspark.sql import functions as F

    # materialize BEFORE overwriting the path being read (localCheckpoint
    # breaks the plan's lineage to the source files; prod Iceberg uses
    # rewrite_data_files and never needs this)
    df = read_table(spark, path).localCheckpoint(eager=True)
    # driver-side partition list is fine here: this is a maintenance op
    # and the partition count is the (small) bucket count, not the rows
    n_parts = df.select(partition_col).distinct().count()
    n = max(n_parts, 1) * max_files_per_partition
    if max_files_per_partition > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(max_files_per_partition))
        compacted = (df.withColumn("_cfs", salt)
                     .repartition(n, F.col(partition_col), F.col("_cfs"))
                     .drop("_cfs"))
    else:
        compacted = df.repartition(n, F.col(partition_col))
    write_overwrite_partitions(compacted, path, partition_col)
    # the checkpointed snapshot has served its purpose (the rewrite is
    # on disk) — release it instead of leaking it for the session life
    from .textops import _release_local_checkpoint
    _release_local_checkpoint(df)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return read_pages(spark, path)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-readable URI (file://, hdfs://,
    s3a://, ...) — the portable way to probe/rename outside the JVM-less
    local-path fast paths."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def path_committed(spark: SparkSession, dst: str) -> bool:
    """Has a previous write to ``dst`` COMMITTED? (ADVICE r5 #1.)

    * ``iceberg:`` tables commit atomically (snapshot swap), so a
      readable table IS a committed table — read-probe.
    * Every other path (local AND remote parquet dirs) requires the
      ``_SUCCESS`` marker, checked through the Hadoop FileSystem API.
      Merely-readable is NOT committed: a crash mid-write under a v2
      output committer leaves partially-promoted part files that
      read_table happily loads — resuming from those silently adopts a
      partial survivor set (and, for ingest, permanently pollutes the
      dedup index with the dropped remainder's absence)."""
    if dst.startswith(ICEBERG_PREFIX):
        try:
            read_table(spark, dst)
            return True
        except Exception:
            return False
    try:
        fs, p = _hadoop_fs(spark, f"{dst}/_SUCCESS")
        return bool(fs.exists(p))
    except Exception:
        return False


def atomic_rename_fs(path: str) -> bool:
    """True when ``path`` lives on a filesystem whose directory rename is
    atomic (local paths, file://, hdfs://, viewfs://) — there the
    swap_dirs promotion is the safe compaction strategy (ADVICE r6 #2:
    hdfs: paths were wrongly routed to the overwrite-in-place fallback).
    Object stores (s3a://, gs://, ...) emulate rename by copy+delete and
    table formats commit at the catalog, so both take the non-swap
    path."""
    if path.startswith(ICEBERG_PREFIX):
        return False
    if "://" not in path:
        return True
    return path.split("://", 1)[0] in ("file", "hdfs", "viewfs")


def recover_swapped_dir(spark: SparkSession, path: str) -> bool:
    """Crash-window repair for ``swap_dirs`` (ADVICE r6 #4): between its
    two renames ``path`` does not exist — a crash there leaves the data
    at ``path.old``. If ``path`` is missing and ``path.old`` survives,
    rename it back and return True; a live ``path`` is never touched
    (swap_dirs itself clears stale ``.old`` residue on its next run)."""
    fs, p_dst = _hadoop_fs(spark, path)
    _, p_old = _hadoop_fs(spark, f"{path}.old")
    if fs.exists(p_dst) or not fs.exists(p_old):
        return False
    if not fs.rename(p_old, p_dst):
        raise IOError(f"recovery rename {path}.old -> {path} failed")
    return True


def swap_dirs(spark: SparkSession, tmp: str, path: str) -> None:
    """Promote a freshly-written sibling directory over ``path`` with
    rename-level atomicity (ADVICE r5 #3): ``path`` → ``path.old``,
    ``tmp`` → ``path``, delete ``path.old``. A crash between the two
    renames leaves the data recoverable at ``path.old`` (and the
    completed rewrite at ``tmp``) — never a deleted-then-half-rewritten
    directory, which is unrecoverable when the source plan was a
    lineage-free snapshot. Works through the Hadoop FileSystem API so
    local and remote parquet behave identically; Iceberg callers should
    use the atomic table-level ops instead.

    CONCURRENCY CONTRACT (ADVICE r6 #4): a reader that lists ``path``
    inside the between-renames window sees FileNotFound, so maintenance
    jobs that swap a live table (e.g. ``compact_dedup_index``) must not
    run concurrently with jobs reading it (e.g. an ingest stream against
    the same index) — schedule compaction in the ingest's idle window.
    If a crash lands in the window, ``recover_swapped_dir`` restores
    ``path`` from ``path.old``."""
    fs, p_old = _hadoop_fs(spark, f"{path}.old")
    _, p_tmp = _hadoop_fs(spark, tmp)
    _, p_dst = _hadoop_fs(spark, path)
    if fs.exists(p_old):        # leftover from an earlier crash
        fs.delete(p_old, True)
    if fs.exists(p_dst):
        if not fs.rename(p_dst, p_old):
            raise IOError(f"rename {path} -> {path}.old failed")
    if not fs.rename(p_tmp, p_dst):
        raise IOError(f"rename {tmp} -> {path} failed")
    fs.delete(p_old, True)


def read_pages_jsonl(spark: SparkSession, src: str) -> DataFrame:
    """P1 scan over JSONL pages (one JSON object per line; ``html`` is
    base64 — JSON can't carry raw bytes). Yields PAGES_SCHEMA. Useful for
    crawl exports; file-level parallelism like the WARC source."""
    from pyspark.sql import functions as F
    from .schema import PAGES_SCHEMA
    from pyspark.sql.types import (StringType, StructField, StructType,
                                   TimestampType)
    wire = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html_b64", StringType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ])
    df = spark.read.schema(wire).json(src)
    # same columns/types as PAGES_SCHEMA; JSON sources can't declare
    # non-null columns, so rows missing either non-null field (url,
    # warc_ts) are dropped — downstream dedup windows / watermarks /
    # dedup_first_latest all assume warc_ts is never null
    _ = PAGES_SCHEMA
    return (df.filter(F.col("url").isNotNull()
                      & F.col("warc_ts").isNotNull())
            .select("url", "warc_ts",
                    F.unbase64("html_b64").alias("html"), "text", "lang"))


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """P7 variant: persist a table bucketed (and optionally sorted) by the
    join key — Spark's sort-merge-bucket layout. Two tables bucketed the
    same way join with NO Exchange on either side (co-located join), the
    100 TB answer to repeated large-large joins on a stable key. Requires
    a metastore-backed saveAsTable (local derby in the sandbox; Hive/Glue/
    Iceberg in prod)."""
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


__all__ = ["get_spark", "read_pages", "write_append",
           "write_overwrite_partitions", "read_table", "read_pages_jsonl",
           "write_bucketed", "path_committed", "swap_dirs",
           "atomic_rename_fs", "recover_swapped_dir", "ICEBERG_PREFIX"]
