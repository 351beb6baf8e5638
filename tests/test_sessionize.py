"""Custom stateful streaming operator test: gap-based sessionization via
applyInPandasWithState, driven by a two-batch file stream so the watermark
advances and event-time timeouts fire."""

import datetime as dt
import os

from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType, TimestampType)

EVENTS_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("ts", TimestampType(), False),
    StructField("value", DoubleType(), False),
])

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(user, minute, value):
    return (user, T0 + dt.timedelta(minutes=minute), float(value))


def test_sessionize_events(spark, tmp_path):
    from mre.streaming import sessionize_events

    src = str(tmp_path / "events_src")
    os.makedirs(src)
    # batch 1: user 1 has a session (0,2,5 min) then a gap; user 2 one event
    b1 = [_mk(1, 0, 1.0), _mk(1, 2, 2.0), _mk(1, 5, 3.0), _mk(2, 1, 10.0)]
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(src, "b1"))
    # batch 2: events far in the future push the watermark past
    # (last_ts + gap) for both users' open sessions
    b2 = [_mk(3, 300, 1.0), _mk(3, 301, 1.0)]
    spark.createDataFrame(b2, EVENTS_SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(src, "b2"))

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    sessions = sessionize_events(stream, gap_minutes=10,
                                 watermark="1 minute")
    q = (sessions.writeStream.format("memory")
         .queryName("sessions_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["user_id"]: r
            for r in spark.sql("select * from sessions_out").collect()}
    assert 1 in rows and 2 in rows
    s1 = rows[1]
    assert s1["session_start"] == T0
    assert s1["session_end"] == T0 + dt.timedelta(minutes=5)
    assert s1["n_events"] == 3
    assert abs(s1["total_value"] - 6.0) < 1e-9
    s2 = rows[2]
    assert s2["n_events"] == 1
    assert abs(s2["total_value"] - 10.0) < 1e-9


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """Differential: the stateful streaming sessionizer and the
    SQL-oracle-checked batch twin (q_sessionize_batch) must emit the same
    (user, start, end, n, total) session set once every session closes."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from mre.streaming import sessionize_events

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet") \
        .select("user_id", "ts", "value")
    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    ev.coalesce(2).write.parquet(os.path.join(src, "b1"))
    # sentinel user far in the future: watermark passes last_ts + gap for
    # every real session, so all of them close and emit
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame(
        [(999999, far, 0.0), (999999, far + dt.timedelta(minutes=1), 0.0)],
        EVENTS_SCHEMA).coalesce(1).write.parquet(os.path.join(src, "b2"))

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    sessions = sessionize_events(stream, gap_minutes=10,
                                 watermark="1 minute")
    q = (sessions.writeStream.format("memory")
         .queryName("sessions_diff").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.user_id, r.session_start, r.session_end, r.n_events,
            round(r.total_value, 6))
           for r in spark.sql("select * from sessions_diff").collect()
           if r.user_id != 999999}
    expect = {(r.user_id, r.session_start, r.session_end, r.n_events,
               round(r.total_value, 6))
              for r in em.q_sessionize_batch(spark, sf)
              .withColumn("total_value", F.col("total_value")).collect()}
    # batch rounds total_value to 3 decimals; align the comparison
    got3 = {(u, s, e, n, round(t, 3)) for u, s, e, n, t in got}
    exp3 = {(u, s, e, n, round(t, 3)) for u, s, e, n, t in expect}
    assert got3 == exp3
