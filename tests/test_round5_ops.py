"""Round-5 additions: PageRank convergence/dangling-mass variants,
AQE skew-join evidence, and the bucketed iterative-loop demonstration
(VERDICT r4 items 6-8)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import graph as G
from climate_anomaly_bigdata_pipeline_spark.operators import relational as R


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---- PageRank: reference parity, dangling mass, tol termination -------------


def _ref_pagerank(edges, d=0.85, iters=3, dangling="none", tol=None):
    """Closed-form reference: the same recurrence in plain Python."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out: dict = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        contrib = {x: 0.0 for x in nodes}
        for u, v in edges:
            contrib[v] += r[u] / out[u]
        m = (
            sum(r[x] for x in nodes if x not in out)
            if dangling == "redistribute"
            else 0.0
        )
        new = {
            x: (1 - d) / n + d * (contrib[x] + m / n)
            for x in nodes
        }
        delta = sum(abs(new[x] - r[x]) for x in nodes)
        r = new
        if tol is not None and delta < tol:
            break
    return r


# 1→2→3→4 (4 dangling), plus 1→3, 2→4, and an isolated-ish 5→1.
_EDGES = [(1, 2), (2, 3), (3, 4), (1, 3), (2, 4), (5, 1)]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in G.pagerank(df, **kw).collect()
    }


@pytest.mark.parametrize("dangling", ["none", "redistribute"])
def test_pagerank_matches_python_reference(spark, dangling):
    got = _spark_ranks(spark, _EDGES, n_iter=4, dangling=dangling)
    want = _ref_pagerank(_EDGES, iters=4, dangling=dangling)
    assert set(got) == set(want)
    for x in want:
        assert abs(got[x] - want[x]) < 1e-12, (x, got[x], want[x])


def test_pagerank_redistribute_conserves_mass(spark):
    got = _spark_ranks(spark, _EDGES, n_iter=6, dangling="redistribute")
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # default mode leaks mass through the dangling node 4
    leaky = _spark_ranks(spark, _EDGES, n_iter=6)
    assert sum(leaky.values()) < 1.0 - 1e-3


def test_pagerank_tol_stops_early(spark):
    # tol large enough that round 1's delta already clears it: the
    # result must equal the 1-iteration reference, not the 10-iteration
    # one (proves the break executes).
    got = _spark_ranks(spark, _EDGES, n_iter=10, tol=10.0)
    want1 = _ref_pagerank(_EDGES, iters=1)
    want10 = _ref_pagerank(_EDGES, iters=10)
    for x in want1:
        assert abs(got[x] - want1[x]) < 1e-12
    assert any(abs(want1[x] - want10[x]) > 1e-6 for x in want1)


def test_pagerank_tol_converged_fixed_point(spark):
    got = _spark_ranks(
        spark, _EDGES, n_iter=100, tol=1e-12, dangling="redistribute"
    )
    want = _ref_pagerank(
        _EDGES, iters=100, dangling="redistribute", tol=1e-12
    )
    for x in want:
        assert abs(got[x] - want[x]) < 1e-9


# ---- AQE skew-join: split evidence + salted-join parity ---------------------


def test_aqe_skew_join_splits_and_matches_salted(spark):
    """The engine's session enables AQE skew handling; demonstrate it:
    a sort-merge join on a deliberately skewed key gets its hot
    partition split (skew=true in the final plan) and returns exactly
    the rows the explicit salted_join produces."""
    n_hot, n_cold = 20_000, 50
    big = spark.range(n_hot + n_cold).select(
        F.when(F.col("id") < n_hot, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("v")
    )
    saved = {
        c: spark.conf.get(c, None)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # Force a shuffle join and thresholds small enough that the
        # hot key's partition counts as skewed at test scale.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        joined = big.join(small, "k")
        rows = joined.collect()  # materialize so AQE finalizes the plan
        plan = plan_of(joined)
        assert re.search(r"skew\s*=\s*true", plan, re.I), plan
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)

    salted = R.salted_join(big, small, on="k").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, salted))
    assert len(rows) == n_hot + n_cold


# ---- bucketed iterative loop: the join pays no Exchange ---------------------


def test_bucketed_rank_loop_join_is_exchange_free(spark, sf_dir):
    """SCALE.md's prescription for iterative graph loops, proven on a
    plan: with edges AND ranks bucketed by the join key, one
    PageRank-style round (join ranks onto edges + contribution sum by
    dst) plans exactly ONE Exchange — the dst aggregation — while the
    unbucketed twin shuffles both join inputs too."""
    edges = spark.range(2_000).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 31) % 89).alias("dst")
    )
    ranks = spark.range(97).select(
        F.col("id").alias("src"), F.lit(1.0 / 97).alias("rank")
    )
    for t in ("edges_b", "ranks_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    edges.write.bucketBy(8, "src").sortBy("src").mode("overwrite").saveAsTable(
        "edges_b"
    )
    ranks.write.bucketBy(8, "src").sortBy("src").mode("overwrite").saveAsTable(
        "ranks_b"
    )

    def one_round(e, r):
        return (
            e.join(r, "src")
            .select("dst", (F.col("rank") / F.lit(2.0)).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = one_round(spark.table("edges_b"), spark.table("ranks_b"))
        plain = one_round(edges, ranks)
        n_b = len(re.findall(r"\(\d+\) Exchange", plan_of(bucketed)))
        n_p = len(re.findall(r"\(\d+\) Exchange", plan_of(plain)))
        assert n_b == 1, plan_of(bucketed)
        assert n_p >= 2, plan_of(plain)
        # same answer either way (double sums associate differently
        # across partitionings — compare within float tolerance)
        b = dict(map(tuple, bucketed.collect()))
        p = dict(map(tuple, plain.collect()))
        assert set(b) == set(p)
        assert all(abs(b[k] - p[k]) < 1e-12 for k in b)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        for t in ("edges_b", "ranks_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
