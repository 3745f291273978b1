"""Coverage queries rounding out SURVEY §2's engine additions: CUBE,
deterministic sampling, multi-source union, approximate distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.queries import query

_CUBE_ORACLE = """
SELECT
    l_returnflag, l_linestatus,
    round(sum(l_quantity), 2) AS sum_qty,
    count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_lineitem", oracle=_CUBE_ORACLE)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE totals over (flag, status): all four grouping combinations
    in one pass (Expand + single aggregation, not four scans)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_SAMPLE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(concat('0x', substr(md5(concat('sample:', o_orderkey)), 1, 8)) AS BIGINT)
      % 100 < 10
"""


@query("deterministic_sample", oracle=_SAMPLE_ORACLE)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample via md5 bucketing on the key.

    Deviation from the reference's ``df.sample`` (SURVEY §2.6 O3):
    random sampling isn't oracle-checkable or stable across runs —
    hash-mod sampling is deterministic, engine-portable, and stable
    under data growth (a row's membership never changes)."""
    od = Catalog(spark, sf_dir).orders
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("sample:"), F.col("o_orderkey"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    return od.filter(bucket < 10).select("o_orderkey", "o_custkey", "o_totalprice")


_UNION_ORACLE = """
WITH activity AS (
    SELECT user_id AS actor_id, 'event' AS kind FROM events
    UNION ALL
    SELECT o_custkey AS actor_id, 'order' AS kind FROM orders
)
SELECT kind, count(*) AS n, count(DISTINCT actor_id) AS n_actors
FROM activity
GROUP BY kind
"""


@query("union_multi_source", oracle=_UNION_ORACLE)
def union_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName over two differently-shaped sources projected to a
    shared activity schema (SURVEY §2.6: union as the natural
    multi-source ingest generalization)."""
    c = Catalog(spark, sf_dir)
    ev = c.events.select(F.col("user_id").alias("actor_id"), F.lit("event").alias("kind"))
    od = c.orders.select(F.col("o_custkey").alias("actor_id"), F.lit("order").alias("kind"))
    return (
        ev.unionByName(od)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("actor_id").alias("n_actors"),
        )
    )


_INTERSECT_ORACLE = """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@query("intersect_customers", oracle=_INTERSECT_ORACLE)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers holding both finished and open
    orders — completes the set-operation trio with union/except."""
    od = Catalog(spark, sf_dir).orders
    f = od.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o = od.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return f.intersect(o)


@query("approx_distinct_users")  # no oracle: HLL sketches are engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct per event type (rows-only check: the HLL
    estimate is engine-specific by construction; the exact variant is
    oracle-checked inside union_multi_source / groupby_kpis)."""
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# One SQL text, two engines: the Spark side executes the IDENTICAL
# string through the SQL front-end (spark.sql over registered views),
# demonstrating the Column-API/SQL equivalence SURVEY §2.7 requires.
_GROUPING_SETS_SQL = """
SELECT
    l_returnflag, l_linestatus,
    round(sum(l_quantity), 2) AS sum_qty,
    count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("grouping_sets_lineitem", oracle=_GROUPING_SETS_SQL)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS totals via the SQL front-end — the exact oracle
    string runs on Spark (one Expand + single aggregation over the
    three sets, same plan family as rollup/cube — no multi-scan)."""
    Catalog(spark, sf_dir).register_views(("lineitem",))
    return spark.sql(_GROUPING_SETS_SQL)
