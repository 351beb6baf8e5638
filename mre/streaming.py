"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2C).

The extraction core is stateless per row, so streaming is a thin wrapper:
``readStream`` over a pages source → watermark + streaming dedup on url →
the same ``extract_batch`` mapInPandas → sink. The watermark bounds the
dedup state (at 10^12-doc scale the state store would otherwise grow
without bound). Dedup semantics are selectable at the API:
``keep="first"`` (immediate emit, first capture wins) or ``keep="latest"``
(batch-parity within the watermark window via max_by) — see
``streaming_extract``.

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
                      watermark: str = "1 hour",
                      keep: str = "first") -> DataFrame:
    """pages stream → extraction stream.

    DEDUP SEMANTICS (API contract — pick per use case):

    * ``keep="first"`` (default): ``dropDuplicatesWithinWatermark`` — the
      FIRST capture per url wins and every kept row emits immediately
      (lowest latency, bounded state). NOTE this differs from the batch
      pipeline, which keeps the LATEST capture per url: a re-crawl with
      changed html inside the watermark is DROPPED here.
    * ``keep="latest"``: batch-parity within the watermark — per
      (event-time window of the watermark size, url), keep the capture
      with max warc_ts via ``max_by``. Rows emit only once the watermark
      passes their window end (append-mode aggregation): higher latency,
      same bounded state, and agreement with the batch window dedup for
      duplicates landing in the same window.

    True global latest-wins is unbounded state in a stream; the watermark
    is the horizon in both modes."""
    pages = pages.filter(F.col("html").isNotNull())
    if keep == "latest":
        deduped = (pages
                   .withWatermark("warc_ts", watermark)
                   .groupBy(F.window("warc_ts", watermark).alias("_w"),
                            "url")
                   .agg(F.max_by(F.struct("warc_ts", "html"),
                                 "warc_ts").alias("_latest"))
                   .select("url",
                           F.col("_latest.warc_ts").alias("warc_ts"),
                           F.col("_latest.html").alias("html")))
    elif keep == "first":
        deduped = (pages
                   .withWatermark("warc_ts", watermark)
                   .dropDuplicatesWithinWatermark(["url"]))
    else:
        raise ValueError(f"keep must be 'first' or 'latest', got {keep!r}")
    salted = with_salt_bucket(deduped, buckets)
    return (salted
            .select("url", "warc_ts", "html", "salt_bucket")
            .mapInPandas(extract_batch, EXTRACT_FULL_SCHEMA))


def sessionize_events(events: DataFrame, gap_minutes: int = 10,
                      watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization per
    user via ``applyInPandasWithState`` (the arbitrary-state API).

    State per user = (session_start, last_ts, n_events, total_value); a
    session closes when no event arrives within ``gap_minutes`` of the
    last one (event-time timeout driven by the watermark). Emits one row
    per closed session — the pattern for any custom stateful op the
    built-in windowed aggregations can't express.
    """
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap = dt.timedelta(minutes=gap_minutes)

    out_schema = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events bigint, "
                  "total_value double")
    state_schema = ("session_start timestamp, last_ts timestamp, "
                    "n_events bigint, total_value double")

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "session_start": start,
                "session_end": last, "n_events": n,
                "total_value": float(total)}])
            return
        start = last = None
        n, total = 0, 0.0
        if state.exists:
            start, last, n, total = state.get
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts = ts.to_pydatetime()
                if last is not None and ts - last > gap:
                    closed.append({
                        "user_id": user_id, "session_start": start,
                        "session_end": last, "n_events": n,
                        "total_value": float(total)})
                    start, n, total = ts, 0, 0.0
                if start is None:
                    start = ts
                last = ts
                n += 1
                total += float(value)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(int(
            (last + gap).timestamp() * 1000))
        if closed:
            yield pd.DataFrame(closed)

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))


def _epoch_phases(spark: SparkSession, epochs_dst: str,
                  epoch_id: int) -> set:
    """Marker phases already committed for this epoch ('written',
    'indexed') — a tiny table read + constant-shaped collect."""
    from .io import read_table
    try:
        e = read_table(spark, epochs_dst) \
            .filter(F.col("epoch") == int(epoch_id))
        return {r["phase"] for r in e.select("phase").distinct().collect()}
    except Exception:
        return set()


def _mark_epoch(spark: SparkSession, epochs_dst: str, epoch_id: int,
                phase: str, n_docs: int) -> None:
    """Append one marker row. For plain local paths the row is written
    directly with pyarrow into a dot-prefixed temp file and renamed
    into place — a Spark write job for a 1-row table costs ~0.4 s of
    pure scheduling/commit overhead, twice per epoch (round 8). The
    rename is atomic on a local filesystem and Spark ignores
    dot-prefixed files, so a reader can never observe a torn marker
    file (a torn file would fail the WHOLE epochs-table read, which
    ``_epoch_phases`` maps to 'no phases' — exactly the unsafe
    full-recompute the marker protocol exists to prevent). Remote and
    iceberg: destinations keep the committer-backed Spark write."""
    from .io import ICEBERG_PREFIX, write_append
    if "://" not in epochs_dst \
            and not epochs_dst.startswith(ICEBERG_PREFIX):
        try:
            import datetime
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq
            os.makedirs(epochs_dst, exist_ok=True)
            tbl = pa.table({
                "epoch": pa.array([int(epoch_id)], pa.int64()),
                "phase": pa.array([phase], pa.string()),
                "n_docs": pa.array([int(n_docs)], pa.int64()),
                # tz-aware (isAdjustedToUTC) so Spark reads the same
                # TimestampType current_timestamp() would have written
                "committed_at": pa.array(
                    [datetime.datetime.now(datetime.timezone.utc)],
                    pa.timestamp("us", tz="UTC")),
            })
            name = f"part-marker-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(epochs_dst, f".{name}")
            pq.write_table(tbl, tmp)
            os.rename(tmp, os.path.join(epochs_dst, name))
            return
        except ImportError:
            pass
    write_append(
        spark.createDataFrame([(int(epoch_id), phase, int(n_docs))],
                              "epoch long, phase string, n_docs long")
        .withColumn("committed_at", F.current_timestamp()),
        epochs_dst)


def ingest_epoch(spark: SparkSession, df: DataFrame, epoch_id: int,
                 index_dst: str, accepted_dst: str, epochs_dst: str, *,
                 threshold: float = 0.5,
                 max_bucket: int | None = None) -> None:
    """One idempotent ingest micro-batch: dedup ``df`` against the
    corpus index, land survivors under ``{accepted_dst}/epoch=N``,
    extend the index, and record progress in the tiny ``epochs_dst``
    marker table ('written' after the partition commit, 'indexed' after
    the index append).

    The markers exist for the retry path (ADVICE r6 #1 — the MEDIUM):
    ``update_dedup_index`` can crash after SOME of the batch's
    fingerprint rows became visible (v2 committer / partial task
    promotion). A retry that recomputed ``dedup_increment`` would see
    those rows, drop the already-accepted docs at the exact-vs-index
    anti-join, and dynamic-overwrite epoch=N with the REDUCED survivor
    set — silent permanent loss. So on retry:

    * 'indexed' present → the epoch fully converged; no-op.
    * 'written' present → the survivor set on disk is authoritative;
      SKIP the recompute-and-rewrite entirely, re-read epoch=N's rows
      and go straight to the idempotent ``update_dedup_index``
      (fingerprint-guarded — re-applying converges the partial append).
    * neither → full compute. A crash between the partition write and
      the 'written' marker re-enters here, which is safe precisely
      because the index has not been touched yet in that window — the
      recompute is deterministic and rewrites the same partition.

    Duplicate marker rows (crash between a sink and its marker) are
    harmless: phases are read as a set. Residual caveat: the guarantee
    assumes this function is the only writer mutating the index between
    a batch's two phases — which the per-epoch serial foreachBatch
    contract provides."""
    from .curate import dedup_increment, update_dedup_index
    from .io import read_table, write_overwrite_partitions
    from .textops import (_release_local_checkpoint, cache_mark,
                          release_caches)
    phases = _epoch_phases(spark, epochs_dst, epoch_id)
    if "indexed" in phases:
        return
    mark = cache_mark()
    if "written" in phases:
        surv = (read_table(spark, accepted_dst)
                .filter(F.col("epoch") == int(epoch_id)).drop("epoch")
                .localCheckpoint(eager=True))
        try:
            update_dedup_index(spark, surv, index_dst)
            _mark_epoch(spark, epochs_dst, epoch_id, "indexed",
                        surv.count())
        finally:
            _release_local_checkpoint(surv)
            release_caches(since=mark)
        return
    surv0 = dedup_increment(spark, df, index_dst, threshold=threshold,
                            max_bucket=max_bucket, update_index=False)
    # the signature frame dedup_increment already materialized for this
    # batch — handed to update_dedup_index below so the index append
    # does not re-run the k-hash signature scan (round 8)
    sig_surv = getattr(surv0, "_mre_sig_surv", None)
    surv = surv0.localCheckpoint(eager=True)
    try:
        n = surv.count()
        write_overwrite_partitions(
            surv.withColumn("epoch", F.lit(int(epoch_id))),
            accepted_dst, "epoch")
        _mark_epoch(spark, epochs_dst, epoch_id, "written", n)
        # assume_fresh: the marker protocol guarantees the index is
        # untouched for this epoch on THIS path (any retry after a
        # partial append re-enters via 'written' above, which keeps the
        # fingerprint guard), so the already-present probe is skipped
        update_dedup_index(spark, surv, index_dst, sigs=sig_surv,
                           assume_fresh=True)
        _mark_epoch(spark, epochs_dst, epoch_id, "indexed", n)
    finally:
        _release_local_checkpoint(surv)
        release_caches(since=mark)


def start_ingest_stream(spark: SparkSession, src_dir: str, index_dst: str,
                        accepted_dst: str, checkpoint_dir: str, *,
                        schema: str = "doc_id long, text string",
                        max_files_per_trigger: int = 16,
                        available_now: bool = False,
                        threshold: float = 0.5,
                        max_bucket: int | None = None,
                        epochs_dst: str | None = None,
                        compact_every: int | None = None):
    """CONTINUOUS ingestion dedup (round 6): the Structured-Streaming
    twin of ``scripts/run_ingest.py`` — each micro-batch of newly
    crawled documents is deduplicated against the pre-banded corpus
    index via ``mre.curate.dedup_increment`` (exact + near, vs corpus
    AND within the batch), survivors land under
    ``{accepted_dst}/epoch=N``, and the index is extended so the NEXT
    micro-batch sees this one. Returns the StreamingQuery.

    Delivery semantics: foreachBatch re-runs a micro-batch after a
    failure; each epoch converges through the phase-marker protocol in
    ``ingest_epoch`` (see its docstring) — the accepted partition is a
    dynamic overwrite, the index append is fingerprint-guarded, and a
    retry after a PARTIAL index append re-reads the committed survivor
    set instead of recomputing it, so already-accepted docs can never
    be silently dropped (ADVICE r6 #1). ``epochs_dst`` is the tiny
    marker table backing that protocol (default:
    ``{accepted_dst}_epochs``).

    Scale notes: the per-batch cost is O(batch) — the index side of
    every join is a bucket-pruned scan feeding broadcast probes; the
    per-epoch partition layout doubles as time-ordered lineage (epoch
    → files) and compacts with ``compact_partitions``. Use
    ``available_now=True`` for a drain-and-stop backfill run.

    ``compact_every=K`` (round 7) runs ``compact_dedup_index`` after
    every K-th epoch, INSIDE foreachBatch — the one place the
    swap-based compaction's no-concurrent-reader contract (ADVICE r6
    #4) is free, because the stream is the index's only reader and it
    is quiescent between micro-batches. Each ingest epoch appends a few
    files per index table, so a long-running stream without this decays
    into the small-file swarm compaction exists to fix. Idempotent
    under foreachBatch retries: compaction is content-preserving and
    self-healing (it re-promotes a half-finished swap before
    rewriting), and the preceding ``ingest_epoch`` retry path is
    marker-guarded."""
    ep_dst = epochs_dst or f"{accepted_dst}_epochs"
    batches = (spark.readStream
               .schema(schema)
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .parquet(src_dir))

    def _one_batch(df, epoch_id: int) -> None:
        ingest_epoch(df.sparkSession, df, epoch_id, index_dst,
                     accepted_dst, ep_dst, threshold=threshold,
                     max_bucket=max_bucket)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            from .curate import compact_dedup_index
            compact_dedup_index(df.sparkSession, index_dst)

    writer = (batches.writeStream
              .foreachBatch(_one_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_extract_stream(spark: SparkSession, src_dir: str, dst_dir: str,
                         checkpoint_dir: str, buckets: int = 32,
                         keep: str = "first", watermark: str = "1 hour",
                         max_files_per_trigger: int = 16):
    """End-to-end streaming job; exactly-once via checkpoint + file sink.
    Returns the StreamingQuery (caller awaits/stops). ``keep`` selects the
    dedup semantics — see streaming_extract."""
    pages = read_pages_stream(spark, src_dir, max_files_per_trigger)
    extracted = streaming_extract(pages, buckets, watermark, keep)
    return (extracted.writeStream
            .format("parquet")
            .option("path", dst_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start())


__all__ = ["read_pages_stream", "streaming_extract", "start_extract_stream",
           "start_ingest_stream", "ingest_epoch", "sessionize_events"]
