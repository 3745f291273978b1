"""Relational-core queries (SURVEY.md §2.2-2.4, §2.6) on the driver corpus.

Each generalizes a reference operator to the TPC-H-ish tables with a
DuckDB oracle. Aggregate columns are rounded where floating-point
accumulation order could differ between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark import functions as FN
from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from climate_anomaly_bigdata_pipeline_spark.queries import query

# --- A1: hash group-by, multi-aggregate (the reference's yearly KPIs,
#     jobs/03_silver_to_gold.py:33-43, on lineitem) -------------------------

# l_quantity is integer-valued, so Σx and Σx² are exact in double
# (< 2^53): mean/stddev derived from them with a fixed op order are
# identical across engines and parallelism — unlike streaming
# avg/stddev_samp, which accumulate in shuffle order.
_GROUPBY_KPIS_ORACLE = """
WITH g AS (
    SELECT
        l_returnflag, l_linestatus,
        sum(l_quantity)                AS s1,
        sum(l_quantity * l_quantity)   AS s2,
        CAST(count(l_quantity) AS DOUBLE) AS n,
        round(max(l_quantity), 4)      AS max_qty,
        round(min(l_quantity), 4)      AS min_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE)
                                       AS revenue,
        count(*)                       AS n_rows,
        count(DISTINCT l_suppkey)      AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
)
SELECT
    l_returnflag, l_linestatus,
    round(s1 / n, 4) AS avg_qty,
    max_qty, min_qty,
    CASE WHEN n < 2 THEN NULL
         ELSE round(sqrt(greatest((s2 - (s1 * s1) / n) / (n - 1), 0.0)), 4)
    END AS std_qty,
    revenue, n_rows, n_suppliers
FROM g
"""


@query("groupby_kpis", oracle=_GROUPBY_KPIS_ORACLE)
def groupby_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-agg KPI rollup per (returnflag, linestatus): avg/max/min/
    sample-stddev (jobs/03_silver_to_gold.py:33-38) + revenue, counts,
    and the scalar station-count analog as count distinct (A2).
    Moments from exact sums; money in exact decimal."""
    li = Catalog(spark, sf_dir).lineitem
    q = F.col("l_quantity")
    g = R.multi_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.sum(q).alias("s1"),
            F.sum(q * q).alias("s2"),
            F.count(q).cast("double").alias("n"),
            F.round(F.max(q), 4).alias("max_qty"),
            F.round(F.min(q), 4).alias("min_qty"),
            F.round(F.sum(FN.revenue_expr()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        ],
    )
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("n")
    std = F.sqrt(F.greatest((s2 - (s1 * s1) / n) / (n - 1), F.lit(0.0)))
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(s1 / n, 4).alias("avg_qty"),
        "max_qty",
        "min_qty",
        F.when(n < 2, None).otherwise(F.round(std, 4)).alias("std_qty"),
        "revenue",
        "n_rows",
        "n_suppliers",
    )


# --- J2: multi-way equi join (notebook cell 18 generalized) ----------------

_JOIN_REVENUE_ORACLE = """
SELECT
    n.n_name                                   AS nation,
    year(o.o_orderdate)                        AS order_year,
    CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
    count(*)                                   AS n_items
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, year(o.o_orderdate)
"""


@query("join_revenue_by_nation_year", oracle=_JOIN_REVENUE_ORACLE)
def join_revenue_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders⋈customer⋈nation revenue rollup.

    Join strategy for 100 TB: nation (25 rows) and customer (bounded
    dim) are broadcast so the only shuffle of the fact table is the
    lineitem⋈orders equi join + the final partial-aggregated groupBy.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    od = c.orders.select("o_orderkey", "o_custkey", "o_orderdate")
    cu = c.customer.select("c_custkey", "c_nationkey")
    na = c.nation.select("n_nationkey", "n_name")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
    ).agg(
        F.round(F.sum(FN.revenue_expr()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- J3: left outer join (notebook cell 19 generalized) --------------------

_LEFT_JOIN_ORACLE = """
SELECT
    c.c_custkey,
    c.c_name,
    count(o.o_orderkey)                          AS n_open_orders,
    CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0), 2) AS DOUBLE) AS open_total
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
       ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


@query("left_join_order_counts", oracle=_LEFT_JOIN_ORACLE)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer left-join open orders; customers with none keep a zero
    row (count over the null-extended right side)."""
    c = Catalog(spark, sf_dir)
    open_orders = c.orders.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cu = c.customer.select("c_custkey", "c_name")
    return (
        R.equi_join(cu, open_orders, on=cu.c_custkey == open_orders.o_custkey, how="left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_open_orders"),
            F.round(F.coalesce(F.sum(FN.dec("o_totalprice")), F.lit(0.0)), 2)
            .cast("double")
            .alias("open_total"),
        )
    )


# --- Semi / anti joins (engine additions per SURVEY §2.3) ------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
)
"""


@query("semi_join_big_spenders", oracle=_SEMI_ORACLE)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one >450k order. The
    right side is projected to the join key only before the semi join."""
    c = Catalog(spark, sf_dir)
    big = c.orders.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return c.customer.select("c_custkey", "c_name", "c_acctbal").join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
"""


@query("anti_join_inactive_customers", oracle=_ANTI_ORACLE)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no open ('O') orders."""
    c = Catalog(spark, sf_dir)
    open_orders = c.orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return c.customer.select("c_custkey", "c_name").join(
        open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )


# --- J1 + O1: bounded, ordered cross join ----------------------------------

_CROSS_ORACLE = """
SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name
FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 10) n
CROSS JOIN region r
"""


@query("cross_join_limited", oracle=_CROSS_ORACLE)
def cross_join_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join with a bounded small side (jobs/03_silver_to_gold.py:
    77-85). Deviation from reference: the limited side is ordered first
    so the result is deterministic (SURVEY §2.6 O1)."""
    c = Catalog(spark, sf_dir)
    return R.bounded_cross_join(
        c.nation.select("n_nationkey", "n_name"),
        c.region.select("r_regionkey", "r_name"),
        limit=10,
        order_by="n_nationkey",
    )


# --- A6: pivot / crosstab ---------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = """
SELECT
    CAST(ts AS DATE) AS event_date,
    count(*) FILTER (WHERE event_type = 'click')    AS click,
    count(*) FILTER (WHERE event_type = 'error')    AS error,
    count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
    count(*) FILTER (WHERE event_type = 'signup')   AS signup,
    count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY CAST(ts AS DATE)
"""


@query("pivot_events_daily", oracle=_PIVOT_ORACLE)
def pivot_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-day × event-type crosstab (notebook cell 16). The
    pivot domain is pinned (no distinct-value pre-pass at scale)."""
    ev = Catalog(spark, sf_dir).events
    return R.pivot_count(
        ev, F.to_date("ts").alias("event_date"), "event_type", _EVENT_TYPES
    )


# --- A7: null profile --------------------------------------------------------

_NULL_PROFILE_ORACLE = """
SELECT
    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_c_custkey,
    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_o_orderkey,
    CAST(sum(CASE WHEN o.o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
       ON c.c_custkey = o.o_custkey
"""


@query("null_profile", oracle=_NULL_PROFILE_ORACLE)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column null counts (notebook cell 21) over a
    null-producing left join."""
    c = Catalog(spark, sf_dir)
    open_orders = c.orders.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    joined = c.customer.select("c_custkey").join(
        open_orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    return R.null_profile(joined, ["c_custkey", "o_orderkey", "o_totalprice"])


# --- A8: histogram -----------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT
    CAST(least(greatest(floor((value - 0.0) / 20.0), 0), 24) AS INT) AS bucket,
    count(*) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


@query("histogram_event_values", oracle=_HISTOGRAM_ORACLE)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25-bin fixed-range histogram over events.value (notebook cells
    6/13): pure-expression bucketing, one partial-aggregated shuffle."""
    ev = Catalog(spark, sf_dir).events
    return R.histogram(ev, "value", lo=0.0, hi=500.0, nbins=25)


# --- A9: per-group exact percentiles ----------------------------------------

_PERCENTILES_ORACLE = """
SELECT
    l_returnflag,
    round(quantile_cont(l_quantity, 0.25), 4) AS p25,
    round(quantile_cont(l_quantity, 0.50), 4) AS p50,
    round(quantile_cont(l_quantity, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentiles_by_returnflag", oracle=_PERCENTILES_ORACLE)
def percentiles_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles per group (notebook cell 7 boxplot stats): exact
    interpolated percentile matching DuckDB quantile_cont."""
    li = Catalog(spark, sf_dir).lineitem
    return R.group_percentiles(li, ["l_returnflag"], "l_quantity")


# --- W4 + O-ops: top-k, per-group top-k --------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("topk_orders", oracle=_TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (notebook cell 15 top-extremes).
    orderBy+limit plans as TakeOrderedAndProject — per-partition heaps,
    no full sort, no single-node shuffle of the whole table."""
    od = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return R.topk(od, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 10)


_TOPK_PER_GROUP_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal, rn
FROM (
    SELECT c_nationkey, c_custkey, c_acctbal,
           row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
           ) AS rn
    FROM customer
)
WHERE rn <= 3
"""


@query("topk_customers_per_nation", oracle=_TOPK_PER_GROUP_ORACLE)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: row_number window with a
    deterministic tiebreak (one shuffle by nation key)."""
    cu = Catalog(spark, sf_dir).customer.select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    return R.topk_per_group(
        cu,
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )


# --- Rollup (engine addition per SURVEY §2.4) --------------------------------

_ROLLUP_ORACLE = """
SELECT
    l_returnflag, l_linestatus,
    round(sum(l_quantity), 2) AS sum_qty,
    count(*)                  AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_lineitem", oracle=_ROLLUP_ORACLE)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP: (flag, status), (flag), ()."""
    li = Catalog(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- Set ops (engine addition per SURVEY §2.6) -------------------------------

_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("except_high_balance_no_f", oracle=_EXCEPT_ORACLE)
def except_high_balance_no_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) set difference: high-balance customers minus
    those with finished orders. ``subtract`` is Spark's EXCEPT DISTINCT
    — correct regardless of duplicate rows on either side (an
    exceptAll+distinct composition would resurrect left values that
    also appear on the right whenever the left key is non-unique)."""
    c = Catalog(spark, sf_dir)
    left = c.customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    right = (
        c.orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return left.subtract(right)


# --- Exact dedup (north-star §2.10) ------------------------------------------

_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM (
    SELECT event_id, user_id, event_type, value,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS rn
    FROM events
)
WHERE rn = 1
"""


@query("dedup_first_event", oracle=_DEDUP_ORACLE)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup: earliest event per (user, type),
    event_id tiebreak. The oracle casts ts to microseconds so both
    engines order on identical precision."""
    ev = Catalog(spark, sf_dir).events
    return R.dedup_exact(
        ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")]
    ).select("event_id", "user_id", "event_type", "value")


# --- JSON extraction (north-star text ops; events.props) ---------------------

_JSON_ORACLE = """
SELECT
    event_type,
    round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
    max(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k
FROM events
GROUP BY event_type
"""


@query("json_extract_props", oracle=_JSON_ORACLE)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON path extraction from the props column + aggregate."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# --- MERGE/upsert (SCD-1) over a keyed profile table ------------------------

_MERGE_CUTOFF = "2024-01-16"

_MERGE_ORACLE = f"""
WITH base AS (
    SELECT user_id, count(*) AS n_events, max(ts) AS last_seen
    FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF}'
    GROUP BY user_id
),
upd AS (
    SELECT user_id, count(*) AS n_events, max(ts) AS last_seen
    FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF}'
    GROUP BY user_id
)
SELECT COALESCE(b.user_id, u.user_id) AS user_id,
       COALESCE(b.n_events, 0) + COALESCE(u.n_events, 0) AS n_events,
       CASE WHEN u.last_seen IS NULL THEN b.last_seen
            WHEN b.last_seen IS NULL THEN u.last_seen
            WHEN u.last_seen > b.last_seen THEN u.last_seen
            ELSE b.last_seen END AS last_seen,
       CASE WHEN b.user_id IS NULL THEN 'inserted'
            WHEN u.user_id IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_status
FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
"""


@query("merge_upsert_users", oracle=_MERGE_ORACLE)
def merge_upsert_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (SCD-1 upsert): a first-half-of-month user
    profile table upserted with second-half activity — counts add,
    last-seen takes the newer timestamp, and each row is tagged
    inserted/updated/unchanged. One full-outer shuffle join on the
    key — the lakehouse MERGE execution shape."""
    ev = Catalog(spark, sf_dir).events
    cutoff = F.lit(_MERGE_CUTOFF).cast("timestamp")
    prof = lambda d: d.groupBy("user_id").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_seen")
    )
    base = prof(ev.filter(F.col("ts") < cutoff))
    upd = prof(ev.filter(F.col("ts") >= cutoff))
    b_ls, u_ls = F.col("b.last_seen"), F.col("u.last_seen")
    return R.merge_upsert(
        base,
        upd,
        on="user_id",
        set_exprs={
            "n_events": F.coalesce(F.col("b.n_events"), F.lit(0))
            + F.coalesce(F.col("u.n_events"), F.lit(0)),
            "last_seen": F.when(u_ls.isNull(), b_ls)
            .when(b_ls.isNull(), u_ls)
            .when(u_ls > b_ls, u_ls)
            .otherwise(b_ls),
        },
    )


# --- Deequ-style data-quality check suite -----------------------------------

_DQ_ORACLE = """
WITH m AS (
    SELECT
        CAST(count(*) AS DOUBLE) AS row_count,
        round(1.0 - CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                         AS DOUBLE) / count(*), 6) AS completeness_o_totalprice,
        round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6)
            AS uniqueness_o_orderkey,
        round(min(o_totalprice), 6) AS min_o_totalprice,
        CAST(year(max(o_orderdate)) AS DOUBLE) AS max_order_year
    FROM orders
)
SELECT check_name, metric,
       CASE check_name
            WHEN 'row_count' THEN metric >= 1
            WHEN 'completeness_o_totalprice' THEN metric >= 1.0
            WHEN 'uniqueness_o_orderkey' THEN metric >= 1.0
            WHEN 'min_o_totalprice' THEN metric >= 0.0
            WHEN 'max_order_year' THEN metric <= 2030
       END AS passed
FROM (
    SELECT unnest(['row_count', 'completeness_o_totalprice',
                   'uniqueness_o_orderkey', 'min_o_totalprice',
                   'max_order_year']) AS check_name,
           unnest([row_count, completeness_o_totalprice,
                   uniqueness_o_orderkey, min_o_totalprice,
                   max_order_year]) AS metric
    FROM m
)
"""


@query("data_quality_orders", oracle=_DQ_ORACLE)
def data_quality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders (completeness, key uniqueness,
    value bounds, freshness) — all metrics in ONE partial-aggregated
    scan, unpivoted to (check_name, metric, passed) rows. The one-pass
    generalization of the reference's repeated count() actions
    (jobs/02_bronze_to_silver.py:29-32)."""
    od = Catalog(spark, sf_dir).orders
    n = F.count(F.lit(1))
    return R.quality_profile(
        od,
        metrics={
            "row_count": n.cast("double"),
            "completeness_o_totalprice": F.round(
                F.lit(1.0)
                - F.sum(F.col("o_totalprice").isNull().cast("int")).cast("double") / n,
                6,
            ),
            "uniqueness_o_orderkey": F.round(
                F.countDistinct("o_orderkey").cast("double") / n, 6
            ),
            "min_o_totalprice": F.round(F.min("o_totalprice"), 6),
            "max_order_year": F.year(F.max("o_orderdate")).cast("double"),
        },
        bounds={
            "row_count": (1.0, None),
            "completeness_o_totalprice": (1.0, None),
            "uniqueness_o_orderkey": (1.0, None),
            "min_o_totalprice": (0.0, None),
            "max_order_year": (None, 2030.0),
        },
    )


# --- ntile decile profile (per bounded group) --------------------------------

_NTILE_ORACLE = """
WITH t AS (
    SELECT o_orderpriority, o_totalprice,
           ntile(10) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS decile
    FROM orders
)
SELECT o_orderpriority, CAST(decile AS INTEGER) AS decile,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM t
GROUP BY o_orderpriority, decile
"""


@query("ntile_price_deciles", oracle=_NTILE_ORACLE)
def ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profile of order value within each priority class:
    ntile(10) with a total order (price, key) so bucket boundaries are
    deterministic. ntile needs a per-partition total sort — bounded
    here by the 5 priority classes; for an UNBOUNDED key, use
    percentile-boundary bucketing (see group_percentiles/histogram)
    instead — a global ntile is the canonical single-task trap."""
    from pyspark.sql import Window

    od = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    t = od.withColumn("decile", F.ntile(10).over(w))
    return t.groupBy("o_orderpriority", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total"),
    )


# --- salted join (skew mitigation), checked against the plain-join oracle ----

_SALTED_ORACLE = """
SELECT n.n_name,
       count(*) AS n_items,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("salted_join_revenue", oracle=_SALTED_ORACLE)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier nation through the SALTED join path: the
    fact side spreads each supplier key over 8 salt sub-keys and the
    (small) supplier×nation dim replicates across them, so one hot key
    cannot pin a stage on a single task. The oracle is the plain join —
    salting must be result-invariant."""
    cat = Catalog(spark, sf_dir)
    dim = R.equi_join(
        cat.supplier.select("s_suppkey", "s_nationkey"),
        cat.nation.select("n_nationkey", "n_name"),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
        broadcast_right=True,
    ).select(F.col("s_suppkey").alias("l_suppkey"), "n_name")
    li = cat.lineitem.select("l_suppkey", FN.revenue_expr().alias("__rev"))
    joined = R.salted_join(li, dim, on="l_suppkey", salt=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("__rev"), 2).cast("double").alias("revenue"),
    )


# ---- NULL semantics, pinned explicitly ----------------------------------------

# Engines disagree on DEFAULTS around NULL (Spark sorts ASC NULLS
# FIRST, DuckDB ASC NULLS LAST), agree on the pinned forms. This query
# exercises every NULL rule a pipeline relies on — aggregate skipping,
# COUNT(*) vs COUNT(col), DISTINCT's null handling, nulls as a
# group-by key, and an EXPLICIT "NULLS LAST" ordering — over a corpus
# with injected nulls (every 7th customer's balance).
_NULL_ZOO_ORACLE = """
WITH base AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN NULL
                ELSE CAST(c_acctbal AS DECIMAL(18,6)) END AS bal
    FROM customer
),
ranked AS (
    SELECT c_custkey,
           row_number() OVER (ORDER BY bal DESC NULLS LAST, c_custkey)
               AS rk
    FROM base
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(bal) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT bal) AS BIGINT) AS n_distinct_nonnull,
       CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
       CAST(sum(bal) AS DOUBLE) AS sum_nonnull,
       CAST(min(bal) AS DOUBLE) AS min_nonnull,
       (SELECT c_custkey FROM ranked WHERE rk = 1) AS top_custkey
FROM base
"""


@query("null_semantics_zoo", oracle=_NULL_ZOO_ORACLE)
def null_semantics_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics contract check over an injected-null balance
    column: COUNT(*) counts nulls, COUNT(col)/SUM/MIN/DISTINCT skip
    them, and the top-balance pick uses an EXPLICIT desc_nulls_last
    (engine defaults differ — that's the point of pinning)."""
    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_acctbal").cast("decimal(18,6)"))
        .alias("bal"),
    )
    top = (
        base.orderBy(F.desc_nulls_last("bal"), F.asc("c_custkey"))
        .limit(1)  # TakeOrdered: per-partition heap, no global sort
        .select(F.col("c_custkey").alias("top_custkey"))
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("bal").alias("n_nonnull"),
        F.countDistinct("bal").alias("n_distinct_nonnull"),
        F.sum(F.col("bal").isNull().cast("long")).alias("n_null"),
        F.sum("bal").cast("double").alias("sum_nonnull"),
        F.min("bal").cast("double").alias("min_nonnull"),
    )
    return agg.crossJoin(F.broadcast(top))
