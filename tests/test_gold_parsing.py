"""Tests for the Gold star-schema pipeline and the text-format parsers."""

from __future__ import annotations

import pytest

from climate_anomaly_bigdata_pipeline_spark.sources import text_formats as TF
from tests.oracle_utils import run_check

GOLD_PARSING_QUERIES = [
    "gold_supplier_dim",
    "gold_kpis_yearly",
    "gold_fact_supplier_monthly",
    "gold_extremes",
    "parse_delimited_roundtrip",
    "parse_fixed_width_roundtrip",
]


def test_parse_delimited_berkeley_layout(spark):
    """The real Berkeley 6-column layout parses; the 5-column synthetic
    fallback yields null anomaly (the reference's silent-empty quirk,
    SURVEY §2.1 S2) — preserved, observable, and filterable."""
    lines = spark.createDataFrame(
        [
            ("% comment",),
            (" 1  2000  01  01  2000.001  -0.523",),   # real 6-col layout
            (" 2  2000  01  02  2000.004   1.210",),
            ("2000 01 02 2000.004 1.210",),             # 5-col fallback layout
        ],
        "value string",
    )
    parsed = TF.parse_delimited(
        TF.filter_comments(lines), TF.BERKELEY_DAILY_SPEC
    )
    rows = parsed.collect()
    assert len(rows) == 3
    anomalies = sorted((r["anomaly"] is None) for r in rows)
    assert anomalies == [False, False, True]  # 5-col row -> null anomaly
    good = [r for r in rows if r["anomaly"] is not None]
    assert {round(r["anomaly"], 3) for r in good} == {-0.523, 1.21}


def test_parse_fixed_width_ghcnd_layout(spark):
    line = "USW00000001  40.1234  -74.5678    100 NY TEST_STATION_1"
    df = spark.createDataFrame([(line,), ("SHORT",)], "value string")
    rows = TF.parse_fixed_width(df, TF.GHCND_STATIONS_SPEC).collect()
    by_id = {r["station_id"]: r for r in rows}
    good = by_id["USW00000001"]
    assert good["latitude"] == pytest.approx(40.1234)
    assert good["longitude"] == pytest.approx(-74.5678)
    assert good["state"] == "NY"
    assert good["name"] == "TEST_STATION_1"
    short = by_id["SHORT"]
    assert short["latitude"] is None and short["state"] is None


def test_gold_pipeline_outputs(spark, sf_dir):
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.plans.gold import GoldPipeline

    gp = GoldPipeline(Catalog(spark, sf_dir))
    fact = gp.fact()
    assert fact.count() > 0
    assert {"fact_date", "revenue", "z_score", "location"} <= set(fact.columns)
    kpis = gp.kpis().collect()
    assert all(r["supplier_count"] > 0 for r in kpis)
    # extremes must be a subset of fact rows with |z| >= threshold
    ex = gp.extremes()
    assert ex.count() <= fact.count()


@pytest.mark.parametrize("name", GOLD_PARSING_QUERIES)
def test_oracle_gold_parsing(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, msg
