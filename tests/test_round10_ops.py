"""Round-10 operator regression tests — the ADVICE-r9 contract fixes.

1. global_lead must be NULL-safe: a legitimate NULL lead mid-partition
   (value_col itself NULL on the successor row) must survive, not be
   overwritten by the next partition's first value.
2. running_min must keep exactness for DECIMAL(38,0) magnitudes beyond
   1e20 — the re-injected driver minima are cast to the input dtype so
   least()/coalesce never coerce the column to DECIMAL(38,18).
"""

import pyspark.sql.functions as F
from pyspark.sql import Window

from climate_anomaly_bigdata_pipeline_spark.operators.relational import (
    global_lead,
    running_min,
)


def test_global_lead_null_values_survive(spark):
    """value_col contains NULLs: every mid-sequence NULL lead must stay
    NULL (the window-function reference), at several partition counts."""
    rows = [(i, None if i % 3 == 0 else i * 7) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, v int")
    expected = {
        r["k"]: r["ref"]
        for r in df.withColumn(
            "ref", F.lead("v").over(Window.orderBy("k"))
        ).collect()
    }
    for n_parts in (1, 4, 7):
        got = {
            r["k"]: r["nxt"]
            for r in global_lead(
                df, ["k"], "v", out_col="nxt", n_parts=n_parts
            ).collect()
        }
        assert got == expected, f"n_parts={n_parts}"


def test_running_min_decimal38_0_huge_magnitudes(spark):
    """DECIMAL(38,0) values with |x| >= 1e20 must not be nulled by a
    (38,18) literal coercion — exactness at the full declared range."""
    from decimal import Decimal

    rows = [
        (i, Decimal(10**25 - i * 10**21) * (1 if i % 2 else -1))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k int, v decimal(38,0)")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["k"]: r["ref"]
        for r in df.withColumn("ref", F.min("v").over(w)).collect()
    }
    assert all(v is not None for v in expected.values())
    for n_parts in (1, 3, 6):
        out = running_min(df, ["k"], "v", out_col="rm", n_parts=n_parts)
        assert dict(out.dtypes)["rm"] == "decimal(38,0)", f"n_parts={n_parts}"
        got = {r["k"]: r["rm"] for r in out.collect()}
        assert got == expected, f"n_parts={n_parts}"


def test_pca_gemm_agrees_with_exact_decimal(spark, sf_dir):
    """The float-GEMM production PCA must agree with the exact-DECIMAL
    contract query to rtol 1e-9 on every output (VERDICT r9 #2's done
    criterion) — at round(6) the rows are identical."""
    import math

    from climate_anomaly_bigdata_pipeline_spark.queries.similarityq import (
        pca_top_component_embeddings,
        pca_top_component_gemm,
    )

    sf = sf_dir
    exact = pca_top_component_embeddings(spark, sf).collect()[0].asDict()
    gemm = pca_top_component_gemm(spark, sf).collect()[0].asDict()
    assert exact["n_vectors"] == gemm["n_vectors"]
    for col in (
        "top_eigenvalue",
        "loading_0",
        "loading_1",
        "loading_2",
        "loading_3",
    ):
        assert math.isclose(exact[col], gemm[col], rel_tol=1e-9, abs_tol=1e-9), (
            col,
            exact[col],
            gemm[col],
        )


def test_pca_deflation_first_component_matches_gemm(spark, sf_dir):
    """Component 0 of the deflation query IS the GEMM top component —
    same moments, same fixed iteration — so the rows must be equal."""
    from climate_anomaly_bigdata_pipeline_spark.queries.similarityq import (
        pca_top_component_gemm,
        pca_topk_components_deflation,
    )

    sf = sf_dir
    top = pca_top_component_gemm(spark, sf).collect()[0]
    c0 = pca_topk_components_deflation(spark, sf).collect()[0]
    assert c0["component"] == 0
    assert c0["eigenvalue"] == top["top_eigenvalue"]
    for i in range(4):
        assert c0[f"loading_{i}"] == top[f"loading_{i}"]


def test_dpp_query_plan_carries_dynamic_pruning(spark, sf_dir):
    """partitioned_fact_dpp_revenue must actually plan a dynamicpruning
    partition filter on the fact scan — the mechanism behind the
    oracle row (values alone can't distinguish DPP from a full scan)."""
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        partitioned_fact_dpp_revenue,
    )

    df = partitioned_fact_dpp_revenue(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_bucketed_join_query_is_exchange_free(spark, sf_dir):
    """With broadcast disabled, bucketed_join_revenue's join must read
    both bucketed tables without a shuffle: no Exchange below the
    SortMergeJoin (the layout's entire point)."""
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        bucketed_join_revenue,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_revenue(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    join_part = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in join_part, join_part


def test_bucketed_layout_reregisters_in_fresh_session():
    """A FRESH session must REGISTER the existing bucketed files via
    CREATE TABLE ... CLUSTERED BY instead of rewriting them (saveAsTable
    over an existing location errors — the round-10 bug this guards),
    and the re-registered table must still answer exactly. Runs twice
    in subprocesses: first write, then reuse."""
    import subprocess
    import sys

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tests.conftest import SF_SMOKE

    script = (
        f"import sys\nsys.path.insert(0, {repo!r})\nSF = {SF_SMOKE!r}\n"
        + r"""
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("bktfresh").config("spark.ui.enabled", "false").getOrCreate())
from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
    bucketed_join_revenue,
)
rows = bucketed_join_revenue(spark, SF).collect()
assert len(rows) == 5, rows
total = sum(r.n_lineitems for r in rows)
print("BKT_OK", total)
"""
    )
    outs = []
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=300,
        )
        assert "BKT_OK" in proc.stdout, proc.stderr[-2000:]
        outs.append(proc.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1], outs
