"""Authoritative schemas (SURVEY.md §1.2).

Declared once and shared by the pandas-UDF ``returnType``, the sink DDL,
the fixture generator, and every test — so schema drift is impossible.

All timestamps are UTC; every Spark session this package creates pins
``spark.sql.session.timeZone=UTC`` (SURVEY.md §4.3 determinism row).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: Common-Crawl-style pages table (BASELINE.json:input_hint).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Output of the extraction core (BASELINE.json:north_star typed schema).
EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("headline", StringType(), True),
        StructField("pubdate", TimestampType(), True),
        StructField("authors", ArrayType(StringType()), True),
        StructField("extracted_text", StringType(), True),
    ]
)

# Per-partition lineage/metrics rows for resumable runs
# (BASELINE.json:north_rule "resumable from checkpoint with per-partition
# lineage + metrics").
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("salt_bucket", IntegerType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_ok", LongType(), False),
        StructField("n_failed", LongType(), False),
        StructField("bytes_html", LongType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("completed_at", TimestampType(), False),
    ]
)

# Extraction output + the lineage bookkeeping columns emitted in one pass by
# mapInPandas (split into the two tables by the pipeline afterwards).
EXTRACT_WITH_METRICS_SCHEMA = StructType(
    list(EXTRACT_SCHEMA.fields)
    + [
        StructField("ok", IntegerType(), False),
        StructField("n_bytes_html", LongType(), False),
    ]
)
