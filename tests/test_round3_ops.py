"""Unit tests for the round-3 operators: SCD-2 history, rolling
correlation, Pareto frontier, equi-depth histogram, char entropy,
temperature mixture weights."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from climate_anomaly_bigdata_pipeline_spark.operators import text as TX
from climate_anomaly_bigdata_pipeline_spark.operators import timeseries as TS


# ---- SCD-2 history ----------------------------------------------------------


def test_scd2_compresses_runs_and_chains_intervals(spark):
    rows = [
        (1, "a", 1.0, 10),
        (1, "a", 2.0, 11),  # same state — compressed into version 1
        (1, "b", 3.0, 12),  # change — version 2
        (1, "a", 4.0, 13),  # back to a — version 3 (runs, not values)
        (2, "x", 1.0, 20),  # second key, single version
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts double, event_id int"
    )
    out = TS.scd2_history(
        df, ["user_id"], ["event_type"], "ts", tiebreak_col="event_id"
    ).orderBy("user_id", "version")
    got = [
        (r.user_id, r.event_type, r.version, r.effective_from,
         r.effective_to, r.is_current)
        for r in out.collect()
    ]
    assert got == [
        (1, "a", 1, 1.0, 3.0, False),
        (1, "b", 2, 3.0, 4.0, False),
        (1, "a", 3, 4.0, None, True),
        (2, "x", 1, 1.0, None, True),
    ]


def test_scd2_null_attr_transitions_are_changes(spark):
    rows = [(1, None, 1.0), (1, "a", 2.0), (1, None, 3.0), (1, None, 4.0)]
    df = spark.createDataFrame(rows, "k int, attr string, ts double")
    out = TS.scd2_history(df, ["k"], ["attr"], "ts")
    # null→a→null = 3 versions; trailing null run compresses.
    assert out.count() == 3


# ---- rolling correlation ----------------------------------------------------


def test_rolling_corr_perfect_linear_is_one(spark):
    rows = [(i, float(i), 2.0 * i + 5) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = TS.rolling_corr(df, "t", "x", "y", window=3, out_name="c")
    vals = [r.c for r in out.orderBy("t").collect()]
    assert vals[0] is None and vals[1] is None  # below min_periods
    assert all(v == 1.0 for v in vals[2:])


def test_rolling_corr_anticorrelated_is_minus_one(spark):
    rows = [(i, float(i), -3.0 * i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = TS.rolling_corr(df, "t", "x", "y", window=5, out_name="c")
    assert out.orderBy("t").collect()[-1].c == -1.0


# ---- Pareto frontier --------------------------------------------------------


def test_pareto_frontier_keeps_only_non_dominated(spark):
    # (id, value to maximize, cost to minimize)
    rows = [
        (1, 10.0, 1),  # frontier
        (2, 9.0, 2),   # dominated by 1 (less value, more cost)
        (3, 12.0, 3),  # frontier
        (4, 12.0, 3),  # duplicate point — also non-dominated (no strict)
        (5, 11.0, 3),  # dominated by 3 at equal cost
        (6, 15.0, 5),  # frontier
        (7, 15.0, 6),  # dominated by 6 (same value, higher cost)
    ]
    df = spark.createDataFrame(rows, "id int, v double, c int")
    out = R.pareto_frontier_2d(df, maximize_col="v", minimize_col="c")
    assert sorted(r.id for r in out.collect()) == [1, 3, 4, 6]


# ---- equi-depth histogram ---------------------------------------------------


def test_equi_depth_bucket_sizes_and_bounds(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 26)], "id int, v double")
    out = R.equi_depth_histogram(df, "v", tiebreak=["id"], nbuckets=4)
    rows = {r.bucket: r for r in out.collect()}
    sizes = [rows[b].n for b in sorted(rows)]
    assert sorted(sizes, reverse=True) == sizes and sum(sizes) == 25
    assert max(sizes) - min(sizes) <= 1
    assert rows[1].lo == 1.0 and rows[4].hi == 25.0
    # buckets tile the domain in order without overlap
    bounds = [(rows[b].lo, rows[b].hi) for b in sorted(rows)]
    assert all(b1[1] < b2[0] for b1, b2 in zip(bounds, bounds[1:]))


# ---- char entropy -----------------------------------------------------------


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in TX.char_entropy(df).collect()}
    assert out[1].char_entropy == 0.0 and out[1].n_distinct_chars == 1
    assert out[2].char_entropy == 1.0
    assert out[3].char_entropy == 2.0
    assert out[3].n_chars == 4


def test_char_entropy_uniform_formula(spark):
    text = "abcdefgh" * 3  # 8 symbols, uniform
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = TX.char_entropy(df).collect()[0].char_entropy
    assert got == round(math.log2(8), 4)


# ---- temperature mixture weights --------------------------------------------


def test_temperature_mix_flattens_toward_rare(spark):
    rows = [("big",)] * 16 + [("small",)] * 4
    df = spark.createDataFrame(rows, "src string")
    out = {r.src: r for r in R.temperature_mix(df, "src", alpha=0.5).collect()}
    # sqrt(16)=4, sqrt(4)=2 → weights 2/3, 1/3 (proportional would be .8/.2)
    assert out["big"].weight == round(4 / 6, 6)
    assert out["small"].weight == round(2 / 6, 6)
    assert out["big"].n_docs == 16


def test_temperature_mix_alpha_one_is_proportional(spark):
    rows = [("a",)] * 6 + [("b",)] * 2
    df = spark.createDataFrame(rows, "src string")
    out = {r.src: r for r in R.temperature_mix(df, "src", alpha=1.0).collect()}
    assert out["a"].weight == 0.75 and out["b"].weight == 0.25
