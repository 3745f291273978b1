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
