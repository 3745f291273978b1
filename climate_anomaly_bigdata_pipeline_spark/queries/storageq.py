"""Storage-layout queries: the write-side scale techniques (partitioned
gold facts, bucketed co-located joins) exercised END-TO-END as
oracle-checked queries instead of plan tests alone (VERDICT r9 #6).

Both queries write a layout, read it back, and answer through it; the
oracle answers the same question from the raw source tables, so the
check certifies the layout is LOSSLESS and the layout-aware plan is
semantically identical. The layouts live under the same artifact store
as the ANN codebooks (``sources/artifacts.artifact_dir()``), keyed by
the corpus fingerprint so a regenerated corpus rewrites them and a hot
bench loop reuses them read-only.

Plan-shape guarantees (dynamicpruning filter on the partitioned scan;
exchange-free bucketed SortMergeJoin) are asserted in
``tests/test_scale_techniques.py`` / ``tests/test_round10_ops.py`` —
the oracle rows certify values, the plan tests certify the mechanism.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark import functions as FN
from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.queries import query
from climate_anomaly_bigdata_pipeline_spark.sources.artifacts import artifact_dir


def _corpus_sig(sf_dir: str, table: str) -> str:
    """Layout identity = source path + size/mtime of the source file
    (the codebook-artifact recipe): regenerated corpus → new signature
    → rewrite; unchanged corpus → reuse read-only. A vanished source is
    an ERROR, not a stable signature — hashing just the path would let
    a stale layout serve for a corpus that no longer exists."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(p)
    return hashlib.sha256(
        f"{p}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]


# Writer-side layout spec, validated by the marker at reuse time: bump
# the version (or change the column list / partition scheme) and every
# existing layout is rewritten instead of silently served with the old
# shape. The corpus sig alone can't see writer changes — it identifies
# the SOURCE, the marker identifies the LAYOUT.
_FACT_LAYOUT_VERSION = 2
_FACT_COLS = ["l_shipdate", "l_returnflag", "l_extendedprice", "l_discount"]
_FACT_PARTITION = "ship_yr"


def ensure_partitioned_fact(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per corpus) lineitem partitioned by ship year —
    the gold-fact layout SURVEY §4 prescribes — and return its path.
    The marker pins the full layout spec (version, columns, partition
    scheme), so both a regenerated corpus (new sig → new root) and a
    writer change (marker mismatch) force a rewrite; a torn write
    (files without a marker — the marker is written last) rebuilds
    with overwrite."""
    sig = _corpus_sig(sf_dir, "lineitem")
    root = os.path.join(artifact_dir(), "gold_layout", sig)
    path = os.path.join(root, "li_by_year")
    marker = os.path.join(root, "li_by_year.json")
    spec = {
        "version": _FACT_LAYOUT_VERSION,
        "columns": _FACT_COLS,
        "partition": _FACT_PARTITION,
    }
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == spec:
                return path
    li = Catalog(spark, sf_dir).lineitem.select(
        *_FACT_COLS,
        F.year("l_shipdate").cast("int").alias(_FACT_PARTITION),
    )
    li.write.mode("overwrite").partitionBy(_FACT_PARTITION).parquet(path)
    os.makedirs(root, exist_ok=True)
    with open(marker, "w") as f:
        json.dump(spec, f)
    return path


# ---- dynamic partition pruning through the partitioned gold fact -------------

# The end-to-end DPP shape: the fact is PARTITIONED on the join key,
# the dim side carries a selective comparison filter (a bare boolean
# column would silently disable DPP — Spark's isLikelySelective check;
# see tests/test_scale_techniques.py), and no literal year predicate
# touches the fact — at 100 TB the scan reads ONLY the partitions the
# dim survives, discovered at runtime. The oracle answers from the raw
# tables with the equivalent semi-join semantics.
_DPP_ORACLE = """
WITH yrs AS (
    SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS ship_yr
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) >= 1997
)
SELECT y.ship_yr, l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN yrs y ON CAST(year(l.l_shipdate) AS INTEGER) = y.ship_yr
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("partitioned_fact_dpp_revenue", oracle=_DPP_ORACLE)
def partitioned_fact_dpp_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (ship year, return flag) answered THROUGH the
    year-partitioned gold fact with a runtime-pruned year dim (see the
    comment block). Exact DECIMAL money, integer counts — the layout
    round-trip must be value-identical to the raw-table oracle."""
    fact = spark.read.parquet(ensure_partitioned_fact(spark, sf_dir))
    dim = (
        Catalog(spark, sf_dir)
        .orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.year("o_orderdate").cast("int").alias("ship_yr"))
        .filter(F.col("ship_yr") >= 1997)
        .distinct()
    )
    return (
        fact.join(dim, "ship_yr")
        .groupBy("ship_yr", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(FN.revenue_expr()), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("ship_yr", "l_returnflag")
    )


# ---- bucketed co-located join -------------------------------------------------

# The amortize-the-shuffle layout: both join sides bucketed by their
# join key with EQUAL bucket counts, so the daily fact⋈fact join runs
# exchange-free (and with sortBy, sort-free) forever after one write.
# saveAsTable is required — bucket metadata lives in the catalog, so
# the tables are (re)written per session; the bucket files themselves
# are reused by every query in the session.


def _n_buckets(spark: SparkSession) -> int:
    """Bucket count = the session's default parallelism (the scaling
    lever as code, not prose — round 10 pinned 8 buckets and measured
    the sf10 join capped at 8 of 32 cores). One bucket file pair per
    core keeps the exchange-free SortMergeJoin saturated; on a real
    cluster defaultParallelism is total executor cores, so the layout
    scales with the fleet that will read it."""
    return max(4, spark.sparkContext.defaultParallelism)


def _ensure_bucketed(
    spark: SparkSession,
    table: str,
    loc: str,
    ddl_schema: str,
    key: str,
    build,
    buckets: int,
) -> None:
    """Catalog-register the bucketed table at ``loc``. Bucket metadata
    lives in the session catalog (in-memory here), while the files
    persist in the artifact store — so a NEW session must REGISTER the
    existing files with CREATE TABLE ... CLUSTERED BY ... LOCATION
    rather than rewrite them. Registration is GUARDED by a marker
    written after the build, pinning (buckets, schema, key): files are
    only re-registered when the marker matches the requested spec
    exactly — a bucket-count or schema change (or a torn write that
    died before the marker) rebuilds with overwrite instead of
    silently registering mismatched files, which would misjoin rows in
    the exchange-free plan."""
    if spark.catalog.tableExists(table):
        return
    spec = {"buckets": buckets, "schema": ddl_schema, "key": key}
    marker = loc + ".json"
    if os.path.exists(marker) and os.path.exists(os.path.join(loc, "_SUCCESS")):
        with open(marker) as f:
            if json.load(f) == spec:
                spark.sql(
                    f"CREATE TABLE {table} ({ddl_schema}) USING parquet "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {buckets} BUCKETS LOCATION '{loc}'"
                )
                return
    build().write.bucketBy(buckets, key).sortBy(key).option(
        "path", loc
    ).format("parquet").mode("overwrite").saveAsTable(table)
    with open(marker, "w") as f:
        json.dump(spec, f)


_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY 1
"""


@query("bucketed_join_revenue", oracle=_BUCKETED_ORACLE)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through BUCKETED lineitem ⋈ orders
    (equal bucket counts on the join keys; see the comment block).
    The bucketed plan must produce values identical to the raw join —
    tests/test_round10_ops.py additionally plan-gates that the join is
    exchange-free when broadcast is disabled."""
    cat = Catalog(spark, sf_dir)
    sig = _corpus_sig(sf_dir, "lineitem")
    root = os.path.join(artifact_dir(), "gold_layout", sig)
    nb = _n_buckets(spark)
    # bucket count in the table name AND the location: two sessions
    # with different parallelism never race on one layout, and the
    # marker check inside _ensure_bucketed guards the register path.
    li_tbl, od_tbl = f"li_bkt_{sig}_b{nb}", f"od_bkt_{sig}_b{nb}"
    _ensure_bucketed(
        spark,
        li_tbl,
        os.path.join(root, li_tbl),
        "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
        "l_orderkey",
        lambda: cat.lineitem.select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        nb,
    )
    _ensure_bucketed(
        spark,
        od_tbl,
        os.path.join(root, od_tbl),
        "o_orderkey BIGINT, o_orderpriority STRING",
        "o_orderkey",
        lambda: cat.orders.select("o_orderkey", "o_orderpriority"),
        nb,
    )
    li, od = spark.table(li_tbl), spark.table(od_tbl)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(FN.revenue_expr()), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
