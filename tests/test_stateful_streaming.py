"""applyInPandasWithState across real micro-batch boundaries: state must
carry between batches, and the final emission must equal the batch
aggregate over all data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.streaming.stateful import (
    running_user_totals,
)


def test_stateful_counts_across_microbatches(spark, sf_dir, tmp_path):
    # Split events into two parquet files -> two micro-batches with
    # maxFilesPerTrigger=1, so per-user state genuinely persists across
    # batch boundaries.
    ev = Catalog(spark, sf_dir).events.select("user_id", "value", "event_id")
    src = str(tmp_path / "stream_src")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(os.path.join(src, "p0"))
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(os.path.join(src, "p1"))

    stream = (
        spark.readStream.schema("user_id long, value double, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress is not None
    finally:
        q.stop()

    # update mode emits one row per user per batch; the max n_events per
    # user is the final state.
    final = (
        spark.sql("SELECT * FROM running_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in final.collect()}
    expected = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected


def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming gap-sessionization parity: every session the stream
    CLOSES (by a later event past the gap, or by event-time timeout once
    the watermark passes) must exactly match the batch sessionizer's
    session; the only permissible difference is each user's final
    session when the watermark never advances past its gap edge."""
    import os

    from pyspark.sql import Window
    from climate_anomaly_bigdata_pipeline_spark.operators.timeseries import sessionize
    from climate_anomaly_bigdata_pipeline_spark.streaming.stateful import (
        sessionize_stream,
    )

    gap_min = 30.0
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id")
    src = str(tmp_path / "sess_src")
    # Split by TIME (not arbitrary id): micro-batch 2 must be in front
    # of batch 1's watermark, as a real ordered stream would be —
    # event-time sessionization drops data behind the watermark by
    # contract.
    cutoff = "2024-01-16"
    ev.filter(F.col("ts") < cutoff).write.parquet(os.path.join(src, "p0"))
    ev.filter(F.col("ts") >= cutoff).write.parquet(os.path.join(src, "p1"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = sessionize_stream(stream, gap_minutes=gap_min, watermark="1 second")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }

    batch = sessionize(ev, "ts", "user_id", gap_min, tiebreak_col="event_id")
    sessions = batch.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    expected_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions.collect()
    }
    # Everything the stream emitted is a true batch session...
    assert got <= expected_all
    # ...and nothing but each user's LAST session may be missing.
    w = Window.partitionBy("user_id")
    non_final = sessions.withColumn(
        "last_id", F.max("session_id").over(w)
    ).filter(F.col("session_id") < F.col("last_id"))
    must_have = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in non_final.collect()
    }
    assert must_have <= got
    assert len(got) > 0


def test_dedup_stream_drops_duplicates(spark, sf_dir, tmp_path):
    import os

    from climate_anomaly_bigdata_pipeline_spark.streaming.windows import dedup_stream

    ev = Catalog(spark, sf_dir).events.select("event_id", "ts", "user_id")
    src = str(tmp_path / "dedup_src")
    ev.write.parquet(os.path.join(src, "p0"))
    ev.write.parquet(os.path.join(src, "p1"))  # every event duplicated

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    out = dedup_stream(stream, keys=("event_id",), watermark="2 hours")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_t")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id, count(*) AS c FROM dedup_stream_t GROUP BY event_id")
    assert got.filter(F.col("c") > 1).count() == 0
    assert got.count() == ev.count()
