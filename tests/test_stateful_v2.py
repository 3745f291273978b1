"""transformWithStateInPandas (stateful v2) parity: the final emitted
per-user profile across micro-batches must equal the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.streaming import stateful_v2 as SV2

# transformWithState's state-server protocol speaks protobuf from the
# Python worker; without the google.protobuf package the driver worker
# cannot start. Container constraint (no pip installs) — the processor
# itself is real; applyInPandasWithState (stateful.py) is the covered
# stateful path in this environment.
pytest.importorskip("google.protobuf.descriptor")


def test_stateful_v2_profiles_match_batch(spark, sf_dir, tmp_path):
    # transformWithState requires the RocksDB state store provider
    # (the default HDFS-backed store lacks multi-variable state).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "events_src")
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "value")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
    )
    out = SV2.running_user_profiles_v2(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles_v2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode re-emits per batch: keep the last row per user
    # (largest n_events — the running count is monotone).
    emitted = spark.sql(
        """
        SELECT user_id, n_events, total_value, n_distinct_types FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC
            ) AS rn FROM profiles_v2
        ) WHERE rn = 1
        """
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.countDistinct("event_type").alias("n_distinct_types"),
    )
    g = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4), r["n_distinct_types"])
        for r in emitted.collect()
    }
    w = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4), r["n_distinct_types"])
        for r in want.collect()
    }
    assert g == w
