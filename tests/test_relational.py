"""Unit + oracle tests for the relational core (SURVEY §2.2-2.4, §2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from tests.oracle_utils import run_check

RELATIONAL_QUERIES = [
    "groupby_kpis",
    "join_revenue_by_nation_year",
    "left_join_order_counts",
    "semi_join_big_spenders",
    "anti_join_inactive_customers",
    "cross_join_limited",
    "pivot_events_daily",
    "null_profile",
    "histogram_event_values",
    "percentiles_by_returnflag",
    "topk_orders",
    "topk_customers_per_nation",
    "rollup_lineitem",
    "except_high_balance_no_f",
    "dedup_first_event",
    "json_extract_props",
]


def test_rename(spark):
    df = spark.createDataFrame([(1, "x")], "a int, name string")
    out = R.rename(df, {"name": "location"})
    assert out.columns == ["a", "location"]


def test_validate_required_drops_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, 3.0)], "k int, v double"
    )
    assert R.validate_required(df, ["k", "v"]).count() == 1


def test_rejected_counts_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, None)], "k int, v double"
    )
    [row] = R.rejected_counts(df, ["k", "v"]).collect()
    assert row["total_rows"] == 3 and row["null_k"] == 1 and row["null_v"] == 2


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 55.0, 99.0, 200.0]], "v double")
    rows = {r["bucket"]: r["n"] for r in R.histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert rows[0] == 2  # -5 clamped into bucket 0 alongside 0.0
    assert rows[9] == 2  # 99 in last bucket, 200 clamped down into it
    assert rows[5] == 1  # 55 in bucket 5


def test_dedup_exact_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 2, "second"), ("a", 1, "first"), ("b", 9, "only")],
        "k string, ord int, tag string",
    )
    out = {r["k"]: r["tag"] for r in R.dedup_exact(df, ["k"], [F.col("ord")]).collect()}
    assert out == {"a": "first", "b": "only"}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(5)], "k string, id int, v double"
    )
    out = R.topk_per_group(df, ["k"], [F.col("v").desc()], k=2)
    assert sorted(r["id"] for r in out.collect()) == [3, 4]


def test_bounded_cross_join_deterministic(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], "a int")
    right = spark.createDataFrame([(j,) for j in range(3)], "b int")
    out = R.bounded_cross_join(left, right, limit=2, order_by="a")
    rows = sorted((r["a"], r["b"]) for r in out.collect())
    assert rows == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_oracle_relational(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, msg
