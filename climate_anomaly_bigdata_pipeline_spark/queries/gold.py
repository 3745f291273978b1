"""Gold star-schema queries: the reference's 4-output job on the driver
corpus (``jobs/03_silver_to_gold.py`` end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.functions import dec_avg
from climate_anomaly_bigdata_pipeline_spark.operators import anomaly as A
from climate_anomaly_bigdata_pipeline_spark.plans import medallion as M
from climate_anomaly_bigdata_pipeline_spark.plans.gold import GoldPipeline
from climate_anomaly_bigdata_pipeline_spark.queries import query

# Revenue is summed in exact DECIMAL (order-independent, matching the
# Spark plan's functions.revenue_expr) then cast to double.
_MONTHLY_CTE = """
monthly AS (
    SELECT
        l_suppkey,
        year(l_shipdate)  AS ship_year,
        month(l_shipdate) AS ship_month,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
            AS revenue_raw,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE)
            AS revenue,
        round(avg(l_quantity), 4) AS avg_qty,
        count(*) AS record_count
    FROM lineitem
    GROUP BY 1, 2, 3
)
"""

# Exact decimal moment sums for mean/std (mirrors anomaly.zscore_exact):
# s1 = Σ dec(x), s2 = Σ dec(x)², n — then double math in a fixed order.
_SCORED_CTE = """
scored AS (
    SELECT *,
        CAST(sum(CAST(revenue_raw AS DECIMAL(19,4))) OVER w AS DOUBLE) AS s1,
        CAST(sum(CAST(revenue_raw AS DECIMAL(19,4))
                 * CAST(revenue_raw AS DECIMAL(19,4))) OVER w AS DOUBLE) AS s2,
        CAST(count(*) OVER w AS DOUBLE) AS n
    FROM monthly
    WINDOW w AS (PARTITION BY l_suppkey)
)
"""

_ZSCORE_EXPR = """
    CASE WHEN s.n < 2
           OR sqrt(greatest((s.s2 - (s.s1 * s.s1) / s.n) / (s.n - 1), 0.0)) = 0
         THEN 0.0
         ELSE round((s.revenue_raw - s.s1 / s.n)
                    / sqrt(greatest((s.s2 - (s.s1 * s.s1) / s.n) / (s.n - 1), 0.0)),
                    4)
    END
"""

_DIM_ORACLE = """
SELECT s_suppkey, s_name AS location, n_name AS country, s_acctbal AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
"""


@query("gold_supplier_dim", oracle=_DIM_ORACLE)
def gold_supplier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension table: rename-projection over a broadcast join
    (stations_dim analog, ``jobs/03_silver_to_gold.py:51-65``)."""
    return GoldPipeline(Catalog(spark, sf_dir)).dim()


_KPIS_ORACLE = f"""
WITH {_MONTHLY_CTE},
yearly AS (
    SELECT
        ship_year AS year,
        CAST(sum(CAST(revenue_raw AS DECIMAL(19,4))) AS DOUBLE) AS s1,
        CAST(sum(CAST(revenue_raw AS DECIMAL(19,4))
                 * CAST(revenue_raw AS DECIMAL(19,4))) AS DOUBLE) AS s2,
        CAST(count(*) AS DOUBLE) AS n,
        round(max(revenue_raw), 4) AS max_revenue,
        round(min(revenue_raw), 4) AS min_revenue
    FROM monthly
    GROUP BY ship_year
)
SELECT
    year,
    round(s1 / n, 4) AS avg_revenue,
    max_revenue,
    min_revenue,
    CASE WHEN n < 2 THEN NULL
         ELSE round(sqrt(greatest((s2 - (s1 * s1) / n) / (n - 1), 0.0)), 4)
    END AS std_revenue,
    (SELECT count(*) FROM supplier) AS supplier_count
FROM yearly
"""


@query("gold_kpis_yearly", oracle=_KPIS_ORACLE)
def gold_kpis_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly KPI summary with the scalar-count column
    (``jobs/03_silver_to_gold.py:30-47``, A1+A2)."""
    return GoldPipeline(Catalog(spark, sf_dir)).kpis()


_FACT_ORACLE = f"""
WITH {_MONTHLY_CTE},
{_SCORED_CTE}
SELECT
    s.l_suppkey,
    sup.s_name AS location,
    n.n_name   AS country,
    s.ship_year,
    s.ship_month,
    make_date(s.ship_year, s.ship_month, 1) AS fact_date,
    s.revenue,
    s.avg_qty,
    s.record_count,
    {_ZSCORE_EXPR} AS z_score
FROM scored s
JOIN supplier sup ON s.l_suppkey = sup.s_suppkey
JOIN nation n     ON sup.s_nationkey = n.n_nationkey
"""


@query("gold_fact_supplier_monthly", oracle=_FACT_ORACLE)
def gold_fact_supplier_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-scored supplier×month fact table
    (climate_anomalies_monthly analog, ``jobs/03_silver_to_gold.py:68-142``)."""
    return GoldPipeline(Catalog(spark, sf_dir)).fact()


_EXTREMES_ORACLE = f"""
WITH {_MONTHLY_CTE},
{_SCORED_CTE},
fact AS (
    SELECT
        s.l_suppkey,
        sup.s_name AS location,
        make_date(s.ship_year, s.ship_month, 1) AS fact_date,
        s.revenue,
        {_ZSCORE_EXPR} AS z_score
    FROM scored s
    JOIN supplier sup ON s.l_suppkey = sup.s_suppkey
)
SELECT
    fact_date, l_suppkey, location, revenue, z_score,
    CASE WHEN z_score > 0 THEN 'EXTREME_HIGH' ELSE 'EXTREME_LOW' END AS event_type
FROM fact
WHERE abs(z_score) >= 2.0
"""


@query("gold_extremes", oracle=_EXTREMES_ORACLE)
def gold_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classified extreme months derived from the cached fact
    (climate_extremes analog, ``jobs/03_silver_to_gold.py:144-156``)."""
    return GoldPipeline(Catalog(spark, sf_dir)).extremes()


# The portable re-implementation of the reference's deterministic
# noise/extreme injection (jobs/03_silver_to_gold.py:96-105,123-128),
# oracle-checked end-to-end — possible only because the engine swaps
# the reference's Murmur3 hash for the md5-derived md5_hash32 recipe.
_NOISE_ORACLE = """
WITH monthly AS (
    SELECT
        user_id,
        year(CAST(ts AS TIMESTAMP))  AS year,
        month(CAST(ts AS TIMESTAMP)) AS month,
        CAST(round(CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS base_anomaly
    FROM events
    GROUP BY 1, 2, 3
), keyed AS (
    SELECT *,
        CAST(concat('0x', substr(md5(concat('0:',
            concat_ws(':', user_id, year, month))), 1, 8)) AS BIGINT) AS h
    FROM monthly
), nz AS (
    SELECT user_id, year, month, base_anomaly,
        CASE WHEN h % 25 = 0 THEN 15.0
             WHEN h % 27 = 0 THEN -15.0
             ELSE ((h % 200) - 100) / 50.0 END AS local_noise
    FROM keyed
), an AS (
    SELECT *, CAST(round(CAST(CAST(base_anomaly + local_noise AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE) AS anomaly FROM nz
), sc AS (
    SELECT *,
        CAST(sum(CAST(anomaly AS DECIMAL(15,4))) OVER w AS DOUBLE) AS s1,
        CAST(sum(CAST(anomaly AS DECIMAL(15,4))
                 * CAST(anomaly AS DECIMAL(15,4))) OVER w AS DOUBLE) AS s2,
        CAST(count(*) OVER w AS DOUBLE) AS n
    FROM an
    WINDOW w AS (PARTITION BY user_id)
)
SELECT user_id, year, month, base_anomaly, local_noise, anomaly,
    CASE WHEN local_noise > 10 THEN 5.0
         WHEN local_noise < -10 THEN -5.0
         WHEN n < 2
           OR sqrt(greatest((s2 - (s1 * s1) / n) / (n - 1), 0.0)) = 0 THEN 0.0
         ELSE CAST(round(CAST(CAST((anomaly - s1 / n) / sqrt(greatest((s2 - (s1 * s1) / n) / (n - 1), 0.0)) AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE)
    END AS z_score
FROM sc
"""


@query("demo_noise_zscore", oracle=_NOISE_ORACLE)
def demo_noise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's "Academic Demo Hack" end-to-end on the driver
    corpus: per-(user, year, month) average value + deterministic
    md5-keyed noise, ~4% forced +15 / ~3.7% forced −15 extremes, exact
    per-user z-score, injected rows pinned to z = ±5
    (``jobs/03_silver_to_gold.py:88-128`` under the portable hash)."""
    ev = Catalog(spark, sf_dir).events
    monthly = ev.groupBy(
        "user_id",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
    ).agg(dec_avg("value", 4, "base_anomaly"))
    noisy = monthly.withColumn(
        "local_noise", M.demo_noise_expr(station_col="user_id")
    ).withColumn(
        "anomaly", F.round(F.col("base_anomaly") + F.col("local_noise"), 2)
    )
    scored = A.zscore_exact(noisy, "anomaly", ["user_id"], scale=3)
    return scored.withColumn(
        "z_score", M.force_injected_z(F.col("z_score"), F.col("local_noise"))
    ).select(
        "user_id", "year", "month", "base_anomaly", "local_noise", "anomaly",
        "z_score",
    )
