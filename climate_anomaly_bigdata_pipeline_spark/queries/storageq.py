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


def ensure_bucketed_join_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Build (or register) the bucketed lineitem/orders layout pair and
    return the two table names. Split out of ``bucketed_join_revenue``
    so the bench can time the COLD layout build as its own row
    (VERDICT r13: the canonical map must contain the layout-write cost
    once, not never)."""
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
    return li_tbl, od_tbl


@query("bucketed_join_revenue", oracle=_BUCKETED_ORACLE)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through BUCKETED lineitem ⋈ orders
    (equal bucket counts on the join keys; see the comment block).
    The bucketed plan must produce values identical to the raw join —
    tests/test_round10_ops.py additionally plan-gates that the join is
    exchange-free when broadcast is disabled."""
    li_tbl, od_tbl = ensure_bucketed_join_tables(spark, sf_dir)
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


# ---- z-order clustering effectiveness report ----------------------------------

# The data-skipping layout audit (round 11): interleave the bits of two
# query dimensions (customer bucket, order month) into a Morton
# z-value, chunk rows into files by z-range, and report each file's
# per-dimension min/max "zone map" next to the same report for a
# single-key linear layout. The zone maps ARE the decision: a z-ordered
# file bounds BOTH dimensions (a two-dim point probe prunes ~most
# files), while the linear layout bounds only its sort key — the
# second dimension's span is the full domain, so a probe on it prunes
# nothing. `skip_probe_k2` materializes that for a pinned probe on the
# SECOND dimension alone (k2 = 7, the dimension the linear layout
# cannot bound): true iff the file's zone map excludes the probe. (A
# probe on the sort key itself is the case the linear layout already
# wins — z-ordering trades a little of that for bounding EVERY
# interleaved dimension.)
# Everything is exact integer arithmetic (bit ops + min/max), no
# floats anywhere; one scan, one explode into the two layouts, one
# 32-group aggregate. At 100 TB this is the audit a table-format
# (Iceberg/Delta-style) OPTIMIZE ZORDER job emits to prove the rewrite
# bought skipping — the recipe (Morton interleave → range-chunk →
# zone-map min/max) is the public textbook one.
_ZO_BITS = 4  # 4 bits per dimension -> 8-bit z-value, 16 files per layout
_ZO_FILES = 16
_ZO_PROBE_K2 = 7


def _zo_interleave_sql(k1: str, k2: str) -> str:
    terms = []
    for i in range(_ZO_BITS):
        terms.append(f"((({k1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({k2} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH k AS (
    SELECT CAST(o_custkey % 16 AS INTEGER) AS k1,
           CAST(month(o_orderdate) - 1 AS INTEGER) AS k2
    FROM orders
),
z AS (
    SELECT k1, k2,
           ({_zo_interleave_sql('k1', 'k2')}) AS zv
    FROM k
),
files AS (
    SELECT 'zorder' AS layout, CAST(zv // {256 // _ZO_FILES} AS INTEGER)
               AS file_id, k1, k2
    FROM z
    UNION ALL
    SELECT 'linear' AS layout, CAST(k1 AS INTEGER) AS file_id, k1, k2
    FROM z
)
SELECT layout, file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(k1) AS INTEGER) AS k1_min,
       CAST(max(k1) AS INTEGER) AS k1_max,
       CAST(min(k2) AS INTEGER) AS k2_min,
       CAST(max(k2) AS INTEGER) AS k2_max,
       (NOT (min(k2) <= {_ZO_PROBE_K2} AND {_ZO_PROBE_K2} <= max(k2)))
           AS skip_probe_k2
FROM files
GROUP BY layout, file_id
ORDER BY layout, file_id
"""


@query("zorder_clustering_report", oracle=_ZORDER_ORACLE)
def zorder_clustering_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map report of a Morton z-ordered file layout vs a
    single-key linear layout over orders (see the comment block): per
    (layout, file) row counts, per-dimension min/max, and whether the
    pinned second-dimension point probe can skip the file. Exact
    integers end to end."""
    od = Catalog(spark, sf_dir).orders
    k1 = (F.col("o_custkey") % 16).cast("int")
    k2 = (F.month("o_orderdate") - 1).cast("int")
    k = od.select(k1.alias("k1"), k2.alias("k2"))
    zv = None
    for i in range(_ZO_BITS):
        t1 = F.shiftleft(
            F.shiftright(F.col("k1"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        t2 = F.shiftleft(
            F.shiftright(F.col("k2"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        zv = t1 + t2 if zv is None else zv + t1 + t2
    z = k.withColumn("zv", zv)
    files = z.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    (F.col("zv") / (256 // _ZO_FILES))
                    .cast("int")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.col("k1").cast("int").alias("file_id"),
                ),
            )
        ).alias("f"),
        "k1",
        "k2",
    ).select("f.layout", "f.file_id", "k1", "k2")
    in_k2 = (F.min("k2") <= _ZO_PROBE_K2) & (F.lit(_ZO_PROBE_K2) <= F.max("k2"))
    return (
        files.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k1").cast("int").alias("k1_min"),
            F.max("k1").cast("int").alias("k1_max"),
            F.min("k2").cast("int").alias("k2_min"),
            F.max("k2").cast("int").alias("k2_max"),
            (~in_k2).alias("skip_probe_k2"),
        )
        .orderBy("layout", "file_id")
    )


# ---- column encoding efficiency report ----------------------------------------

# The encoding-selection probe a columnar writer (parquet's
# dictionary/RLE/delta chooser) runs before committing a layout,
# surfaced as a query: order events the way the table is written
# (per-user, time-ascending — the sessionize/scd2 write order) and
# measure, per candidate column, the statistics each encoding keys on:
# run count (RLE pays off when runs are long), distinct count and the
# exact bit width of a dictionary index (length of the binary
# representation of ndv-1 — the integer-exact log2 recipe from
# length_bucket_packing_stats), and for the timestamp column the bit
# width of the largest per-user forward delta in MICROSECONDS
# (unix_micros/epoch_us on both engines — exact integers, no float
# seconds). Scale shape: one per-user window sort (the shape every
# sessionization already pays), map-side-combinable counts, a 2-row
# result. At 100 TB the same statistics decide gigabytes per column.
_ENCODING_ORACLE = """
WITH w AS (
    SELECT event_type,
           epoch_us(ts) AS tus,
           CASE WHEN lag(event_type) OVER uw IS NULL
                     OR event_type <> lag(event_type) OVER uw
                THEN 1 ELSE 0 END AS type_run_start,
           CASE WHEN lag(ts) OVER uw IS NULL
                     OR ts <> lag(ts) OVER uw
                THEN 1 ELSE 0 END AS ts_run_start,
           epoch_us(ts) - lag(epoch_us(ts)) OVER uw AS dus
    FROM events
    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_type) AS BIGINT) AS type_ndv,
           CAST(count(DISTINCT tus) AS BIGINT) AS ts_ndv,
           CAST(sum(type_run_start) AS BIGINT) AS type_runs,
           CAST(sum(ts_run_start) AS BIGINT) AS ts_runs,
           CAST(max(dus) AS BIGINT) AS max_delta_us
    FROM w
)
SELECT col, n, ndv, n_runs,
       round(CAST(n_runs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS runs_ratio,
       CAST(length(bin(ndv - 1)) AS INTEGER) AS dict_index_bits,
       delta_bits
FROM (
    SELECT 'event_type' AS col, n, type_ndv AS ndv, type_runs AS n_runs,
           CAST(NULL AS INTEGER) AS delta_bits
    FROM s
    UNION ALL
    SELECT 'ts' AS col, n, ts_ndv AS ndv, ts_runs AS n_runs,
           CAST(length(bin(max_delta_us)) AS INTEGER) AS delta_bits
    FROM s
)
ORDER BY col
"""


@query("encoding_efficiency_report", oracle=_ENCODING_ORACLE)
def encoding_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column encoding statistics for events written in per-user
    time order (see the comment block): run counts (RLE), distinct
    counts and exact dictionary index bit widths, and the bit width of
    the largest per-user timestamp delta in microseconds."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_t = F.lag("event_type").over(uw)
    lag_ts = F.lag("ts").over(uw)
    w = ev.select(
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.when(
            lag_t.isNull() | (F.col("event_type") != lag_t), 1
        ).otherwise(0).alias("type_run_start"),
        F.when(lag_ts.isNull() | (F.col("ts") != lag_ts), 1)
        .otherwise(0)
        .alias("ts_run_start"),
        (F.unix_micros("ts") - F.unix_micros(lag_ts)).alias("dus"),
    )
    s = w.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_type").alias("type_ndv"),
        F.countDistinct("tus").alias("ts_ndv"),
        F.sum("type_run_start").alias("type_runs"),
        F.sum("ts_run_start").alias("ts_runs"),
        F.max("dus").alias("max_delta_us"),
    )

    def bits(col):
        return F.length(F.conv(col.cast("string"), 10, 2)).cast("int")

    rows = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("col"),
                    F.col("n").cast("long").alias("n"),
                    F.col("type_ndv").cast("long").alias("ndv"),
                    F.col("type_runs").cast("long").alias("n_runs"),
                    F.lit(None).cast("int").alias("delta_bits"),
                ),
                F.struct(
                    F.lit("ts").alias("col"),
                    F.col("n").cast("long").alias("n"),
                    F.col("ts_ndv").cast("long").alias("ndv"),
                    F.col("ts_runs").cast("long").alias("n_runs"),
                    bits(F.col("max_delta_us")).alias("delta_bits"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "col",
        "n",
        "ndv",
        "n_runs",
        F.round(
            F.col("n_runs").cast("double") / F.col("n").cast("double"), 6
        ).alias("runs_ratio"),
        bits(F.col("ndv") - 1).alias("dict_index_bits"),
        "delta_bits",
    ).orderBy("col")


# ---- Bloom-filter semi-join reduction report -----------------------------------

# The runtime-filter technique a 100 TB join lives on (Spark ships it
# as spark.sql.optimizer.runtime.bloomFilter.*): build a Bloom filter
# over the dimension-side join keys (urgent orders), push it to the
# fact-side scan (lineitem), and drop non-matching rows BEFORE the
# shuffle. This row certifies the mechanics with exact numbers: a
# deterministic md5 triple-hash Bloom (k = 3, m = 16 bits/key — fill
# fraction ≤ 3/16 so the analytic FPR stays ~0.5%) simulated as a
# broadcast (hash, position) set join, reporting build/probe
# inventories, rows the filter passes, true semi-join matches, false
# positives, the OBSERVED fpr, and the shuffle-reduction fraction.
# Bloom filters admit no false negatives, so pass ⊇ match is an
# invariant the integer columns prove. All counts are exact integers;
# the two ratios divide identical integers on both engines (round(6)
# guard only for display stability). The md5 position recipe is the
# portable 32-bit hash every dedup operator uses.
_BLOOM_K = 3  # hash functions
_BLOOM_BITS_PER_KEY = 16

_BLOOM_ORACLE = f"""
WITH bk AS (
    SELECT DISTINCT o_orderkey AS k FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
mm AS (
    SELECT CAST({_BLOOM_BITS_PER_KEY} * count(*) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS nb
    FROM bk
),
bits AS (
    SELECT DISTINCT t, p FROM (
        SELECT 0 AS t, CAST(concat('0x', substr(md5(concat('0:',
            CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m AS p
        FROM bk, mm
        UNION ALL
        SELECT 1, CAST(concat('0x', substr(md5(concat('1:',
            CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m
        FROM bk, mm
        UNION ALL
        SELECT 2, CAST(concat('0x', substr(md5(concat('2:',
            CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m
        FROM bk, mm
    )
),
lk AS (
    SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nr
    FROM lineitem GROUP BY 1
),
pp AS (
    SELECT lk.k, lk.nr, 0 AS t, CAST(concat('0x', substr(md5(concat('0:',
        CAST(lk.k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m AS p
    FROM lk, mm
    UNION ALL
    SELECT lk.k, lk.nr, 1, CAST(concat('0x', substr(md5(concat('1:',
        CAST(lk.k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m
    FROM lk, mm
    UNION ALL
    SELECT lk.k, lk.nr, 2, CAST(concat('0x', substr(md5(concat('2:',
        CAST(lk.k AS VARCHAR))), 1, 8)) AS BIGINT) % mm.m
    FROM lk, mm
),
passk AS (
    SELECT pp.k, max(pp.nr) AS nr
    FROM pp JOIN bits ON bits.t = pp.t AND bits.p = pp.p
    GROUP BY pp.k
    HAVING count(*) = {_BLOOM_K}
),
truek AS (
    SELECT lk.k, lk.nr FROM lk WHERE lk.k IN (SELECT k FROM bk)
),
agg AS (
    SELECT (SELECT nb FROM mm) AS build_keys,
           (SELECT m FROM mm) AS m_bits,
           (SELECT CAST(COALESCE(sum(nr), 0) AS BIGINT) FROM lk)
               AS probe_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM lk) AS probe_keys,
           (SELECT CAST(COALESCE(sum(nr), 0) AS BIGINT) FROM passk)
               AS bloom_pass_rows,
           (SELECT CAST(COALESCE(sum(nr), 0) AS BIGINT) FROM truek)
               AS true_match_rows
)
SELECT build_keys, m_bits, probe_rows, probe_keys, bloom_pass_rows,
       true_match_rows,
       bloom_pass_rows - true_match_rows AS false_positive_rows,
       CASE WHEN probe_rows = true_match_rows THEN CAST(0.0 AS DOUBLE)
            ELSE round(CAST(bloom_pass_rows - true_match_rows AS DOUBLE)
                       / CAST(probe_rows - true_match_rows AS DOUBLE), 6)
       END AS observed_fpr,
       round(1.0 - CAST(bloom_pass_rows AS DOUBLE)
                   / CAST(probe_rows AS DOUBLE), 6) AS reduction_frac
FROM agg
"""


@query("bloom_semijoin_reduction", oracle=_BLOOM_ORACLE)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact simulation of a runtime Bloom semi-join filter on the
    urgent-orders → lineitem join (see the comment block): build/probe
    inventories, filter pass and true-match row counts, false
    positives, observed FPR, and the shuffle-reduction fraction."""
    from climate_anomaly_bigdata_pipeline_spark.operators import dedup as DD

    c = Catalog(spark, sf_dir)
    bk = (
        c.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .localCheckpoint()
    )
    nb = bk.count()  # bounded scalar: sizes the filter, trained-codebook posture
    m = _BLOOM_BITS_PER_KEY * nb

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            (DD.md5_hash32(F.col("k"), seed=t) % m).alias("p"),
                        )
                        for t in range(_BLOOM_K)
                    ]
                )
            ).alias("tp"),
        ).select(*df.columns, "tp.t", "tp.p")

    bits = positions(bk).select("t", "p").distinct().localCheckpoint()
    lk = c.lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("nr")
    ).localCheckpoint()
    # no forced broadcast on bits/bk: at sf10 the simulated position
    # set is ~9M rows (a REAL deployment broadcasts the 6 MB bitmap,
    # not rows) — AQE picks broadcast when the stats allow it
    passk = (
        positions(lk)
        .join(bits, ["t", "p"])
        .groupBy("k")
        .agg(F.max("nr").alias("nr"), F.count(F.lit(1)).alias("nhit"))
        .filter(F.col("nhit") == _BLOOM_K)
    )
    truek = lk.join(bk, "k", "left_semi")
    probe = lk.agg(
        F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("probe_rows"),
        F.count(F.lit(1)).cast("long").alias("probe_keys"),
    )
    bp = passk.agg(
        F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("bloom_pass_rows")
    )
    tm = truek.agg(
        F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("true_match_rows")
    )
    fp = F.col("bloom_pass_rows") - F.col("true_match_rows")
    fpr = F.when(
        F.col("probe_rows") == F.col("true_match_rows"), F.lit(0.0)
    ).otherwise(
        F.round(
            fp.cast("double")
            / (F.col("probe_rows") - F.col("true_match_rows")).cast("double"),
            6,
        )
    )
    return (
        probe.crossJoin(F.broadcast(bp))
        .crossJoin(F.broadcast(tm))
        .select(
            F.lit(nb).cast("long").alias("build_keys"),
            F.lit(m).cast("long").alias("m_bits"),
            "probe_rows",
            "probe_keys",
            "bloom_pass_rows",
            "true_match_rows",
            fp.alias("false_positive_rows"),
            fpr.alias("observed_fpr"),
            F.round(
                F.lit(1.0)
                - F.col("bloom_pass_rows").cast("double")
                / F.col("probe_rows").cast("double"),
                6,
            ).alias("reduction_frac"),
        )
    )


# ---- shuffle-key skew report ---------------------------------------------------

# The salting-decision gate: before a 100 TB join you read ONE number
# — how hot is the hottest key relative to the mean — and pick plain
# hash partitioning, AQE skew-join, or explicit salting. This row
# computes that diagnosis for the four join keys the star schema
# actually shuffles on (lineitem: orderkey / partkey / suppkey;
# events: user_id): key cardinality, total rows, mean and max per-key
# row counts, the imbalance factor max/mean, the counts of keys past
# 2x and 10x the mean, and the salt flag (imbalance > 8 — one task
# ~an-order-of-magnitude longer than the average is where AQE's
# skew split stops saving you on a sorted shuffle). Everything is a
# keyed count + scale-safe aggregates — no global sort, no quantile
# funnel; the imbalance ratio divides exact integers identically on
# both engines under the round(6) guard.
_SKEW_SALT_THRESHOLD = 8.0


def _skew_oracle() -> str:
    keys = (
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
    )
    ctes = ",\n".join(
        f"cnt{i} AS (SELECT {col} AS k, count(*) AS c"
        f" FROM {table} GROUP BY 1)"
        for i, (table, col) in enumerate(keys)
    )
    branches = []
    for i, (table, col) in enumerate(keys):
        mean = (
            f"(SELECT CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
            f" FROM cnt{i})"
        )
        imb = (
            "round(CAST(max(c) AS DOUBLE) / (CAST(sum(c) AS DOUBLE)"
            " / CAST(count(*) AS DOUBLE)), 6)"
        )
        branches.append(f"""SELECT '{table}.{col}' AS key_col,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS total_rows,
       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS mean_rows,
       CAST(max(c) AS BIGINT) AS max_rows,
       {imb} AS imbalance,
       CAST(count(*) FILTER (WHERE h2) AS BIGINT) AS keys_over_2x_mean,
       CAST(count(*) FILTER (WHERE h10) AS BIGINT) AS keys_over_10x_mean,
       {imb} > {_SKEW_SALT_THRESHOLD} AS salt_recommended
FROM (
    SELECT c,
           CAST(c AS DOUBLE) > 2.0 * {mean} AS h2,
           CAST(c AS DOUBLE) > 10.0 * {mean} AS h10
    FROM cnt{i}
)""")
    return (
        "WITH " + ctes + "\n"
        + "\nUNION ALL\n".join(branches)
        + "\nORDER BY key_col"
    )


@query("shuffle_skew_report", oracle=_skew_oracle())
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-join-key skew diagnosis for the star schema's four shuffle
    keys (see the comment block): cardinality, mean/max per-key rows,
    the imbalance factor, hot-key counts, and the salt flag."""
    from functools import reduce

    c = Catalog(spark, sf_dir)
    outs = []
    for df, col, label in (
        (c.lineitem, "l_orderkey", "lineitem.l_orderkey"),
        (c.lineitem, "l_partkey", "lineitem.l_partkey"),
        (c.lineitem, "l_suppkey", "lineitem.l_suppkey"),
        (c.events, "user_id", "events.user_id"),
    ):
        # Collapse the per-key counts to the COUNT HISTOGRAM first
        # (distinct per-key row counts — a few hundred values however
        # many keys exist): every statistic below, including the
        # hot-key counts that need the mean, is then computable from
        # the bounded histogram with a 1-row broadcast of the totals —
        # no second full pass over the keys, no materialization of the
        # key-count table (measured 22 s -> ~8 s at sf1).
        hist = (
            df.groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("c")
            .agg(F.count(F.lit(1)).alias("nk"))
        )
        stats = hist.agg(
            F.sum("nk").cast("long").alias("__nkeys"),
            F.sum(F.col("c") * F.col("nk")).cast("long").alias("__tot"),
        )
        mean = F.col("__tot").cast("double") / F.col("__nkeys").cast("double")
        flagged = hist.crossJoin(F.broadcast(stats)).select(
            "c",
            "nk",
            "__nkeys",
            "__tot",
            (F.col("c").cast("double") > F.lit(2.0) * mean).alias("h2"),
            (F.col("c").cast("double") > F.lit(10.0) * mean).alias("h10"),
        )
        imb = F.round(
            F.max("c").cast("double")
            / (
                F.max("__tot").cast("double")
                / F.max("__nkeys").cast("double")
            ),
            6,
        )
        outs.append(
            flagged.agg(
                F.lit(label).alias("key_col"),
                F.max("__nkeys").cast("long").alias("n_keys"),
                F.max("__tot").cast("long").alias("total_rows"),
                F.round(
                    F.max("__tot").cast("double")
                    / F.max("__nkeys").cast("double"),
                    6,
                ).alias("mean_rows"),
                F.max("c").cast("long").alias("max_rows"),
                imb.alias("imbalance"),
                F.sum(F.when(F.col("h2"), F.col("nk")).otherwise(0))
                .cast("long")
                .alias("keys_over_2x_mean"),
                F.sum(F.when(F.col("h10"), F.col("nk")).otherwise(0))
                .cast("long")
                .alias("keys_over_10x_mean"),
                (imb > _SKEW_SALT_THRESHOLD).alias("salt_recommended"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), outs).orderBy("key_col")
