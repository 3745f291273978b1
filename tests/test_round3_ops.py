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


# ---- interval merge (gaps and islands) --------------------------------------


def test_merge_intervals_overlap_touch_and_gap(spark):
    rows = [
        (1, 0.0, 10.0),   # island 1
        (1, 5.0, 12.0),   # overlaps → same island
        (1, 12.0, 15.0),  # touches (start == running max end) → merged
        (1, 20.0, 25.0),  # gap → island 2
        (2, 0.0, 1.0),    # second key independent
    ]
    df = spark.createDataFrame(rows, "k int, s double, e double")
    out = TS.merge_intervals(df, ["k"], "s", "e").orderBy("k", "island")
    got = [(r.k, r.island, r.interval_start, r.interval_end, r.n_merged)
           for r in out.collect()]
    assert got == [
        (1, 1, 0.0, 15.0, 3),
        (1, 2, 20.0, 25.0, 1),
        (2, 1, 0.0, 1.0, 1),
    ]


def test_merge_intervals_contained_interval_extends_nothing(spark):
    rows = [(1, 0.0, 100.0), (1, 10.0, 20.0), (1, 50.0, 120.0)]
    df = spark.createDataFrame(rows, "k int, s double, e double")
    out = TS.merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    assert (out[0].interval_start, out[0].interval_end, out[0].n_merged) == (
        0.0, 120.0, 3,
    )


# ---- cohort retention -------------------------------------------------------


def test_cohort_retention_shares_and_offsets(spark):
    import datetime as dt

    def t(m, d=1):
        return dt.datetime(2024, m, d)

    rows = [
        (1, t(1)), (1, t(1, 15)), (1, t(2)),  # cohort Jan, active Jan+Feb
        (2, t(1)),                            # cohort Jan, Jan only
        (3, t(2)), (3, t(4)),                 # cohort Feb, active Feb+Apr
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = TS.cohort_retention(df, "user_id", "ts")
    got = {
        (str(r.cohort_month), r.month_offset): (r.n_active, r.retention)
        for r in out.collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-02-01", 0)] == (1, 1.0)
    assert got[("2024-02-01", 2)] == (1, 1.0)
    assert ("2024-02-01", 1) not in got


# ---- transition matrix ------------------------------------------------------


def test_transition_matrix_counts_and_rows_sum_to_one(spark):
    rows = [
        (1, "a", 1.0), (1, "b", 2.0), (1, "a", 3.0), (1, "b", 4.0),
        (2, "a", 1.0), (2, "a", 2.0),
    ]
    df = spark.createDataFrame(rows, "k int, s string, ts double")
    out = TS.transition_matrix(df, "k", "s", "ts")
    got = {(r.prev_state, r.s): (r.n_trans, r.prob) for r in out.collect()}
    # from a: a→b twice (user 1), a→a once (user 2) → 2/3, 1/3
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "a")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    # first event of each key contributes no transition
    assert sum(n for n, _ in got.values()) == 4


# ---- grouped linear regression ----------------------------------------------


def test_grouped_linreg_exact_line(spark):
    rows = [("g", float(x), 3.0 * x + 7) for x in range(10)] + [
        ("h", 1.0, 5.0), ("h", 2.0, 4.0), ("h", 3.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in R.grouped_linreg(df, ["g"], "x", "y").collect()}
    assert (out["g"].slope, out["g"].intercept, out["g"].r2) == (3.0, 7.0, 1.0)
    assert out["g"].n_pairs == 10
    assert out["h"].slope == 0.5  # hand OLS: cov/var = 1/2


def test_grouped_linreg_ignores_null_pairs(spark):
    rows = [("g", 1.0, 2.0), ("g", 2.0, None), ("g", None, 9.0), ("g", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = R.grouped_linreg(df, ["g"], "x", "y").collect()[0]
    assert out.n_pairs == 2  # only complete (x, y) pairs enter the fit
    assert out.slope == 2.0


# ---- winsorized statistics --------------------------------------------------


def test_winsorize_clips_tails_only(spark):
    vals = [float(v) for v in range(1, 20)] + [1000.0]  # one huge outlier
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = R.winsorize_stats(df, ["g"], "v", lo=0.05, hi=0.95).collect()[0]
    assert out.n == 20
    assert out.n_clipped_lo == 1 and out.n_clipped_hi == 1
    assert out.mean_winsorized < out.mean_raw  # outlier pulled in
    # p95 fence (exact interpolated) bounds the winsorized mean
    assert out.mean_winsorized < 60.0


def test_winsorize_null_values_pass_through(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None), ("g", 3.0)], "g string, v double"
    )
    out = R.winsorize_stats(df, ["g"], "v", lo=0.0, hi=1.0).collect()[0]
    assert out.n == 4  # count(*) includes the null row
    assert out.n_clipped_lo == 0 and out.n_clipped_hi == 0
    assert out.mean_raw == 2.0  # avg ignores nulls in both engines
    assert out.mean_winsorized == 2.0  # null rows never count as clipped


# ---- prefix-filtered jaccard join -------------------------------------------


def test_prefix_jaccard_equals_quadratic_with_boilerplate(spark):
    """Completeness under shared boilerplate: every doc shares common
    header tokens, near-dup pairs differ in one rare token. The prefix
    filter must still find exactly the pairs the quadratic definition
    gives (no false negatives), and only those (no false positives)."""
    from climate_anomaly_bigdata_pipeline_spark.operators import dedup as DD

    header = "terms of service apply to all content here"
    docs = [
        (1, f"{header} alpha beta gamma delta"),
        (2, f"{header} alpha beta gamma delta"),  # exact dup of 1
        (3, f"{header} alpha beta gamma epsilon"),  # near-dup of 1/2
        (4, f"{header} zeta eta theta iota"),  # shares only boilerplate
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in DD.prefix_filtered_jaccard_pairs(df, threshold=0.8).collect()
    }
    # quadratic ground truth over distinct word sets
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= 0.8:
                    want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_prefix_filter_prunes_boilerplate_only_pairs(spark):
    """A pair sharing ONLY ubiquitous tokens must not survive; docs
    sharing a rare prefix token must become candidates."""
    from climate_anomaly_bigdata_pipeline_spark.operators import dedup as DD

    docs = [(i, "common words everywhere " + f"unique{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = DD.prefix_filtered_jaccard_pairs(df, threshold=0.9).collect()
    assert out == []  # jaccard 3/5 = 0.6 for every pair, all below 0.9


# ---- stable global index ----------------------------------------------------


def test_stable_global_index_is_dense_and_ordered(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k")  # permuted order
    )
    out = R.stable_global_index(df, ["k"], out_col="idx", n_parts=8)
    rows = out.orderBy("k").collect()
    assert [r["idx"] for r in rows] == list(range(10_000))


def test_stable_global_index_avoids_single_partition_sort(spark):
    """The plan must contain NO SinglePartition exchange — the whole
    point over row_number() OVER (ORDER BY ...)."""
    import contextlib
    import io

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = R.stable_global_index(df, ["k"], n_parts=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


# ---- HLL sketch mergeability -----------------------------------------------


def test_hll_union_estimate_close_to_single_pass(spark):
    """Merging per-group sketches must estimate ~the same cardinality
    as one sketch built over all rows (the mergeability contract that
    makes sketch rollups sound)."""
    df = spark.range(0, 50_000).select(
        (F.col("id") % 10).alias("g"), (F.col("id") % 7919).alias("u")
    )
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("u").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    single = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est")
    ).first()["est"]
    exact = df.select("u").distinct().count()
    assert abs(merged - exact) <= 0.05 * exact
    assert abs(single - exact) <= 0.05 * exact
