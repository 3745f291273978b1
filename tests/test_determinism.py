"""Parallelism determinism: rounded analytics must not change when the
shuffle partition count changes (the driver runs a different local[N]
than these tests — accumulation-order-dependent doubles would flip
rounded values between runs)."""

from __future__ import annotations

import pandas as pd
import pytest

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

SENSITIVE = [
    "zscore_anomaly",
    "zscore_events",
    "groupby_kpis",
    "rolling_daily_mean",
    "gold_fact_supplier_monthly",
    "join_revenue_by_nation_year",
]


def _canon(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return str(rows)


@pytest.mark.parametrize("name", SENSITIVE)
def test_stable_under_parallelism(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _canon(QUERIES[name](spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        high = _canon(QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert low == high
