"""Unit + oracle tests for time-series operators (SURVEY §2.5 W3, §2.8)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import timeseries as TS
from tests.oracle_utils import run_check

TS_QUERIES = [
    "rolling_daily_mean",
    "monthly_revenue_delta",
    "tumbling_hourly_events",
    "sliding_2h_events",
    "sessionize_events",
    "range_join_next_hour",
]


def test_rolling_mean_min_periods_nulls(spark):
    """First window-1 rows must be null (pandas rolling semantics)."""
    df = spark.createDataFrame([(i, float(i)) for i in range(5)], "t int, v double")
    rows = sorted(
        TS.rolling_mean(df, "t", "v", window=3).collect(), key=lambda r: r["t"]
    )
    assert rows[0]["rolling_mean"] is None and rows[1]["rolling_mean"] is None
    assert rows[2]["rolling_mean"] == pytest.approx(1.0)  # mean(0,1,2)
    assert rows[4]["rolling_mean"] == pytest.approx(3.0)  # mean(2,3,4)


def test_lag_delta_first_row_null(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 15.0), (3, 12.0)], "t int, v double"
    )
    rows = sorted(TS.lag_delta(df, ["t"], "v").collect(), key=lambda r: r["t"])
    assert rows[0]["delta"] is None
    assert rows[1]["delta"] == 5.0 and rows[2]["delta"] == -3.0


def test_sessionize_gap_split(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=10)),   # same session
        (1, 3, t0 + dt.timedelta(minutes=50)),   # 40-min gap > 30 -> new session
        (2, 4, t0),                               # other user, own session
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    out = {
        r["event_id"]: r["session_id"]
        for r in TS.sessionize(df, "ts", "user_id", 30, "event_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_tumbling_window_alignment(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 59), 1.0), (dt.datetime(2024, 1, 1, 11, 1), 2.0)],
        "ts timestamp, v double",
    )
    out = TS.tumbling_window_agg(df, "ts", "1 hour", [F.sum("v").alias("s")])
    starts = {r["window_start"].hour: r["s"] for r in out.collect()}
    assert starts == {10: 1.0, 11: 2.0}


@pytest.mark.parametrize("name", TS_QUERIES)
def test_oracle_timeseries(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, msg


def test_range_join_band_edges(spark):
    """Inclusive upper bound, strict lower, and matches that cross a
    band boundary must all behave exactly like the naive predicate."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [(1, 10, t0)], "user_id int, event_id int, ts timestamp"
    )
    right_rows = [
        (1, 20, t0),                                  # equal ts: excluded (strict)
        (1, 21, t0 + dt.timedelta(minutes=59)),       # same band, in range
        (1, 22, t0 + dt.timedelta(minutes=60)),       # exactly upper: included
        (1, 23, t0 + dt.timedelta(minutes=61)),       # beyond upper: excluded
        (2, 24, t0 + dt.timedelta(minutes=30)),       # other key: excluded
    ]
    right = spark.createDataFrame(
        right_rows, "user_id int, next_event_id int, next_ts timestamp"
    )
    out = TS.range_join(
        left, right, ["user_id"], "ts", "next_ts", 0.0, 3600.0, strict_lower=True
    )
    assert sorted(r["next_event_id"] for r in out.collect()) == [21, 22]

    # Offset start so the interval straddles a band boundary.
    left2 = spark.createDataFrame(
        [(1, 11, t0 + dt.timedelta(minutes=30))],
        "user_id int, event_id int, ts timestamp",
    )
    out2 = TS.range_join(
        left2, right, ["user_id"], "ts", "next_ts", 0.0, 3600.0, strict_lower=True
    )
    assert sorted(r["next_event_id"] for r in out2.collect()) == [21, 22, 23]


def test_range_join_column_collision_raises(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "k int, ts timestamp")
    with pytest.raises(ValueError, match="collision"):
        TS.range_join(df, df, ["k"], "ts", "ts", 0.0, 60.0)


def test_interval_overlap_join_edges(spark):
    """[start, end) semantics: touching intervals don't overlap; a pair
    spanning several bands appears once; boundary-exact ends stay out
    of the next band."""
    import datetime as dtm

    from climate_anomaly_bigdata_pipeline_spark.operators import timeseries as TS2

    t = lambda h, m=0: dtm.datetime(2024, 1, 1, h, m)
    left = spark.createDataFrame(
        [(1, t(1), t(5)), (2, t(10), t(11))],
        "lid long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [(100, t(2), t(3)),   # inside interval 1 (multi-band left span)
         (200, t(5), t(6)),   # touches interval 1 at 05:00 -> no overlap
         (300, t(10, 30), t(12))],  # overlaps interval 2 by 30 min
        "rid long, r_start timestamp, r_end timestamp",
    )
    out = TS2.interval_overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end", band_seconds=3600
    )
    got = {(r["lid"], r["rid"]): r["overlap_seconds"] for r in out.collect()}
    assert got == {(1, 100): 3600.0, (2, 300): 1800.0}
