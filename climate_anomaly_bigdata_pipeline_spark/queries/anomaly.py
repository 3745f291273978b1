"""Flagship queries: the reference's z-score anomaly analytic on testdata.

Re-targets the Gold-layer pipeline (``jobs/03_silver_to_gold.py:113-153``)
at the driver corpus: per-(user, event-type) standardization of event
values and per-supplier standardization of lineitem prices.

Threshold notes: events.value has heavy tails (max |z| ≈ 4), so the
reference's 2.5 threshold is kept there; l_extendedprice is uniform-ish
within supplier (max |z| < 2), so the lineitem variant uses 1.5 to stay
non-degenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import anomaly as A
from climate_anomaly_bigdata_pipeline_spark.queries import query

_ZSCORE_ANOMALY_ORACLE = """
WITH stats AS (
    SELECT
        event_id, user_id, event_type, value,
        avg(value) OVER (PARTITION BY user_id, event_type) AS mean_value,
        stddev_samp(value) OVER (PARTITION BY user_id, event_type) AS std_value
    FROM events
), scored AS (
    SELECT
        event_id, user_id, event_type, value,
        CASE WHEN std_value IS NULL OR std_value = 0 THEN 0.0
             ELSE round((value - mean_value) / std_value, 4)
        END AS z_score
    FROM stats
)
SELECT
    event_id, user_id, event_type, value, z_score,
    CASE WHEN z_score > 0 THEN 'EXTREME_HIGH' ELSE 'EXTREME_LOW' END AS anomaly_class
FROM scored
WHERE abs(z_score) >= 2.5
"""


@query("zscore_anomaly", oracle=_ZSCORE_ANOMALY_ORACLE)
def zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) value outliers: |z| >= 2.5, classified.

    The reference's entire Gold analytic (W1 window stats + W2 guarded
    z-score + P9 threshold filter + when/otherwise classification,
    ``jobs/03_silver_to_gold.py:113-153``) on the events table. One
    shuffle (hash by the partition keys); only 4 columns reach the
    window, so the parquet scan prunes the rest.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "user_id", "event_type", "value"
    )
    return A.anomaly_pipeline(
        ev,
        "value",
        ["user_id", "event_type"],
        threshold=2.5,
        label_name="anomaly_class",
    )


_ZSCORE_EVENTS_ORACLE = """
WITH stats AS (
    SELECT
        event_id, user_id, event_type, value,
        avg(value) OVER (PARTITION BY user_id, event_type) AS mean_value,
        stddev_samp(value) OVER (PARTITION BY user_id, event_type) AS std_value
    FROM events
)
SELECT
    event_id, user_id, event_type, value,
    CASE WHEN std_value IS NULL OR std_value = 0 THEN 0.0
         ELSE round((value - mean_value) / std_value, 4)
    END AS z_score
FROM stats
"""


@query("zscore_events", oracle=_ZSCORE_EVENTS_ORACLE)
def zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded z-score over a composite partition key (user_id, event_type).

    Exercises the zero/null-stddev guard (``jobs/03_silver_to_gold.py:
    118-121``) on real data: single-row (user, type) groups have null
    sample stddev and must standardize to exactly 0.0.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "user_id", "event_type", "value"
    )
    return A.zscore(ev, "value", ["user_id", "event_type"])


_ZSCORE_LINEITEM_ORACLE = """
WITH stats AS (
    SELECT
        l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
        avg(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mean_value,
        stddev_samp(l_extendedprice) OVER (PARTITION BY l_suppkey) AS std_value
    FROM lineitem
), scored AS (
    SELECT
        l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
        CASE WHEN std_value IS NULL OR std_value = 0 THEN 0.0
             ELSE round((l_extendedprice - mean_value) / std_value, 4)
        END AS z_score
    FROM stats
)
SELECT
    l_orderkey, l_linenumber, l_suppkey, l_extendedprice, z_score,
    CASE WHEN z_score > 0 THEN 'EXTREME_HIGH' ELSE 'EXTREME_LOW' END AS anomaly_class
FROM scored
WHERE abs(z_score) >= 1.5
"""


@query("zscore_lineitem", oracle=_ZSCORE_LINEITEM_ORACLE)
def zscore_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier price outliers (threshold 1.5 for the uniform-ish
    price distribution), same operator composition as the flagship."""
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    return A.anomaly_pipeline(
        li, "l_extendedprice", ["l_suppkey"], threshold=1.5, label_name="anomaly_class"
    )
