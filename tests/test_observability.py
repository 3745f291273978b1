"""observe()-based metrics (operators/observability.py): counters must
match a separate aggregation, measured during the sink action itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import observability as OBS


def test_observed_write_matches_separate_counts(spark, sf_dir, tmp_path):
    ev = Catalog(spark, sf_dir).events.withColumn(
        "value", F.when(F.col("event_id") % 7 != 0, F.col("value"))
    )  # inject nulls
    got = OBS.observed_write_parquet(
        ev, str(tmp_path / "out"), required=["value", "user_id"]
    )
    want_rows = ev.count()
    want_null_value = ev.filter(F.col("value").isNull()).count()
    assert got["n_rows"] == want_rows
    assert got["null_value"] == want_null_value
    assert got["null_user_id"] == 0
    assert got["n_rejected"] == want_null_value  # user_id never null
    # the write itself is complete and lossless
    assert spark.read.parquet(str(tmp_path / "out")).count() == want_rows


def test_metrics_attach_to_any_action(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    observed, obs = OBS.with_quality_metrics(ev, ["props"])
    n = observed.count()  # metrics ride the count action
    assert obs.get["n_rows"] == n
