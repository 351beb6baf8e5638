"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2C).

The extraction core is stateless per row, so streaming is a thin wrapper:
``readStream`` over a pages source → watermark + streaming dedup on url →
the same ``extract_batch`` mapInPandas → sink. Late duplicate captures
inside the watermark are dropped exactly like the batch window dedup; the
watermark bounds the dedup state (at 10^12-doc scale the state store would
otherwise grow without bound).

Not on the byte-parity bar (the reference has no streaming); covered by
tests/test_streaming.py with a file source and one micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import EXTRACT_FULL_SCHEMA, extract_batch, with_salt_bucket
from .schema import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, src_dir: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    """File-based streaming source over a directory of pages parquet.
    In prod this would be Kafka/Kinesis or an Iceberg incremental read;
    the transformation chain below is source-agnostic."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src_dir))


def streaming_extract(pages: DataFrame, buckets: int = 32,
                      watermark: str = "1 hour") -> DataFrame:
    """pages stream → extraction stream.

    dropDuplicates on url within the watermark replaces the batch
    row_number window (streaming can't rank retroactively; first capture
    wins, late re-captures within the watermark are dropped, older ones
    age out of state)."""
    deduped = (pages
               .filter(F.col("html").isNotNull())
               .withWatermark("warc_ts", watermark)
               .dropDuplicatesWithinWatermark(["url"]))
    salted = with_salt_bucket(deduped, buckets)
    return (salted
            .select("url", "html", "salt_bucket")
            .mapInPandas(extract_batch, EXTRACT_FULL_SCHEMA))


def start_extract_stream(spark: SparkSession, src_dir: str, dst_dir: str,
                         checkpoint_dir: str, buckets: int = 32):
    """End-to-end streaming job; exactly-once via checkpoint + file sink.
    Returns the StreamingQuery (caller awaits/stops)."""
    pages = read_pages_stream(spark, src_dir)
    extracted = streaming_extract(pages, buckets)
    return (extracted.writeStream
            .format("parquet")
            .option("path", dst_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start())


__all__ = ["read_pages_stream", "streaming_extract", "start_extract_stream"]
