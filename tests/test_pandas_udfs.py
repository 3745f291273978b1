"""Pandas UDF API surface (SURVEY §2.9): the three Arrow-vectorized
UDF flavors Spark offers beyond mapInPandas/applyInPandas — scalar,
grouped-aggregate, and grouped-aggregate-over-window — each parity-
checked against the equivalent built-in (JVM) expression.

The engine deliberately keeps hot paths on built-in functions (UDFs
are the slow path), so these tests document the CORRECT way to drop
into pandas when a user genuinely needs it, and pin the semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def test_scalar_pandas_udf_matches_builtin(spark, sf_dir):
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    @pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = Catalog(spark, sf_dir).lineitem.limit(500)
    got = li.select(
        F.round(disc_price("l_extendedprice", "l_discount"), 6).alias("x")
    )
    want = li.select(
        F.round(F.col("l_extendedprice") * (1.0 - F.col("l_discount")), 6).alias("x")
    )
    assert sorted(r.x for r in got.collect()) == sorted(
        r.x for r in want.collect()
    )


def test_grouped_agg_pandas_udf_matches_builtin(spark, sf_dir):
    """GROUPED_AGG flavor: a pandas reduction per group — here the
    mean, checked bit-for-bit-ish (rounded) against the JVM avg."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    @pandas_udf("double")
    def pd_mean(v: pd.Series) -> float:
        return float(v.mean())

    ev = Catalog(spark, sf_dir).events
    got = {
        r.event_type: round(r.m, 6)
        for r in ev.groupBy("event_type").agg(pd_mean("value").alias("m")).collect()
    }
    want = {
        r.event_type: round(r.m, 6)
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    assert got == want


def test_grouped_agg_pandas_udf_over_window(spark, sf_dir):
    """The same GROUPED_AGG UDF applied over an unbounded window —
    the per-row group statistic without a join back."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    @pandas_udf("double")
    def pd_mean(v: pd.Series) -> float:
        return float(v.mean())

    ev = Catalog(spark, sf_dir).events.limit(2000)
    w = Window.partitionBy("event_type")
    both = ev.select(
        "event_id",
        F.round(pd_mean("value").over(w), 6).alias("udf_m"),
        F.round(F.avg("value").over(w), 6).alias("jvm_m"),
    )
    assert both.filter(F.col("udf_m") != F.col("jvm_m")).count() == 0
