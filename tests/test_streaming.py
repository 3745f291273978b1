"""Structured Streaming parity tests (SURVEY §2.8): the streaming
window aggregation must match the batch operator on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import timeseries as TS
from climate_anomaly_bigdata_pipeline_spark.streaming import windows as SW


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.windowed_counts_stream(stream, duration="1 hour")
    streamed = SW.run_stream_to_memory(agg, "stream_hourly")
    s = {r["window_start"]: r["n_events"] for r in streamed.collect()}

    ev = Catalog(spark, sf_dir).events
    batch = TS.tumbling_window_agg(ev, "ts", "1 hour", [F.count(F.lit(1)).alias("n_events")])
    b = {r["window_start"]: r["n_events"] for r in batch.collect()}
    assert s == b


def test_stream_sliding_matches_batch(spark, sf_dir):
    stream = SW.read_events_stream(spark, sf_dir)
    agg = SW.windowed_counts_stream(stream, duration="2 hours", slide="1 hour")
    streamed = SW.run_stream_to_memory(agg, "stream_sliding")
    s = {r["window_start"]: r["n_events"] for r in streamed.collect()}

    ev = Catalog(spark, sf_dir).events
    batch = TS.sliding_window_agg(
        ev, "ts", "2 hours", "1 hour", [F.count(F.lit(1)).alias("n_events")]
    )
    b = {r["window_start"]: r["n_events"] for r in batch.collect()}
    assert s == b
