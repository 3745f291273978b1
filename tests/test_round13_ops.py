"""Round-13: the streaming surface under the driver contract.

Parity discipline: every streaming query's drained result must equal
its batch twin BIT-FOR-BIT, including when the bounded source is
forced through MULTIPLE micro-batches (maxFilesPerTrigger=1 over a
3-file split) — the fold-of-monoid state designs (min-struct, integer
cents) make batch boundaries unobservable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_dedup_matches_batch(spark, sf_dir):
    got = _rows_set(QUERIES["streaming_dedup_first_event"](spark, sf_dir))
    want = _rows_set(QUERIES["dedup_first_event"](spark, sf_dir))
    assert got == want and len(want) > 0


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    got = _rows_set(QUERIES["streaming_tumbling_hourly"](spark, sf_dir))
    want = _rows_set(QUERIES["tumbling_hourly_events"](spark, sf_dir))
    assert got == want and len(want) > 0


def test_streaming_sliding_matches_batch(spark, sf_dir):
    got = _rows_set(QUERIES["streaming_sliding_2h"](spark, sf_dir))
    want = _rows_set(QUERIES["sliding_2h_events"](spark, sf_dir))
    assert got == want and len(want) > 0


def test_streaming_totals_cents_exact(spark, sf_dir):
    got = _rows_set(QUERIES["streaming_user_totals_cents"](spark, sf_dir))
    ev = Catalog(spark, sf_dir).events
    want = _rows_set(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    assert got == want and len(want) > 0


def test_streaming_nation_revenue_matches_batch(spark, sf_dir):
    got = _rows_set(QUERIES["streaming_nation_revenue"](spark, sf_dir))
    cat = Catalog(spark, sf_dir)
    want = _rows_set(
        cat.events.filter(F.col("event_type") == "purchase")
        .join(
            cat.customer.select(
                F.col("c_custkey").alias("user_id"), "c_nationkey"
            ),
            "user_id",
        )
        .join(cat.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as 3 parquet files (micros ts, post-Catalog
    repair) so maxFilesPerTrigger=1 forces 3 micro-batches."""
    out = str(tmp_path_factory.mktemp("ev3") / "events3")
    Catalog(spark, sf_dir).events.repartition(3).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _drain_multibatch(spark, stream_df, name: str, mode: str):
    try:
        spark.catalog.dropTempView(name)
    except Exception:  # noqa: BLE001
        pass
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}"), n_batches


def test_multibatch_dedup_parity(spark, sf_dir, split_events_dir):
    """3 forced micro-batches land on the same keep-first winners as
    one batch pass — min-struct state is arrival-order-invariant."""
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
    )
    agg = stream.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id", "value")).alias("w")
    )
    res, n_batches = _drain_multibatch(spark, agg, "t13_dedup", "complete")
    assert n_batches >= 3, n_batches
    got = _rows_set(
        res.select(
            F.col("w.event_id").alias("event_id"),
            "user_id",
            "event_type",
            F.col("w.value").alias("value"),
        )
    )
    want = _rows_set(QUERIES["dedup_first_event"](spark, sf_dir))
    assert got == want


def test_multibatch_totals_cents_parity(spark, sf_dir, split_events_dir):
    """Keyed arbitrary state folds exact integers across 3 forced
    micro-batches; the last emit per key equals the batch totals."""
    from pyspark.sql import Window
    from pyspark.sql.streaming.state import GroupStateTimeout

    from climate_anomaly_bigdata_pipeline_spark.queries.streamingq import (
        _TOTALS_OUT,
        _TOTALS_STATE,
        _totals_cents_update,
    )

    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
    )
    out = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _totals_cents_update,
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    res, n_batches = _drain_multibatch(spark, out, "t13_totals", "update")
    assert n_batches >= 3, n_batches
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = _rows_set(
        res.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )
    ev = Catalog(spark, sf_dir).events
    want = _rows_set(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    assert got == want


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval self-join == the batch interval join."""
    got = _rows_set(
        QUERIES["streaming_click_purchase_interval_join"](spark, sf_dir)
    )
    ev = Catalog(spark, sf_dir).events
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    want = _rows_set(
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .groupBy("purchase_id", F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks_1h"),
            F.min(F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias(
                "min_gap_us"
            ),
        )
    )
    assert got == want and len(want) > 0


def test_streaming_incremental_gold_matches_batch(spark, sf_dir):
    got = _rows_set(
        QUERIES["streaming_incremental_gold_totals"](spark, sf_dir)
    )
    ev = Catalog(spark, sf_dir).events
    cents = F.floor(F.col("value") * 100).cast("long")
    want = _rows_set(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )
    assert got == want and len(want) > 0


def test_streaming_hll_certificate_holds(spark, sf_dir):
    rows = QUERIES["streaming_approx_users_by_type"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.exact_users > 0
        assert r.within_tol
