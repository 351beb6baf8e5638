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
