"""Classic TPC-H query shapes the registry did not yet cover: Q3
(shipping-priority top-k), Q7 (nation-pair volume shipping), Q8
(market share), Q12 (priority × lateness counts), Q13 (customer order
distribution), Q14 (promo revenue share), Q19 (disjunctive predicate
revenue).

These exercise optimizer shapes the reference's 3-job ETL pipeline
never stresses — multi-way join reordering under selective dimension
filters, conditional aggregation, left-join-then-histogram, and a
disjunction of conjunctive range predicates that Catalyst must keep
pushable — and they are the canonical shapes a user scaling to 100 TB
cares about. Join strategy notes per query; every money aggregate uses
the exact-decimal parity recipe from ``functions`` (order-independent
sums, bit-identical across engines).

Reference parity: the reference's analytics live in a notebook
(``climate_analysis.ipynb`` merges/top-k cells); these generalize the
same join+aggregate patterns to the standard benchmark shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark import functions as FN
from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.queries import query

# --- Q3: shipping priority --------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue not-yet-shipped orders for
    one market segment.

    Scale notes: the segment filter prunes customer BEFORE the join
    (predicate pushdown to the parquet scan), the filtered customer
    side is broadcast, and the final top-10 is a TakeOrdered — no
    global sort materializes. Ties broken (o_orderdate, l_orderkey) so
    the result is deterministic across engines.
    """
    c = Catalog(spark, sf_dir)
    cust = c.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    od = c.orders.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = c.lineitem.filter(F.col("l_shipdate") > "1998-01-01").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    agg = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(FN.revenue_expr()), 2).cast("double").alias("revenue"))
    )
    return agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority").orderBy(
        F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
    ).limit(10)


# --- Q7: volume shipping between two nations --------------------------------

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.

    Scale notes: supplier, customer, and both nation aliases are
    broadcast (all bounded dims), so the fact table shuffles exactly
    once — for the lineitem⋈orders equi join — and the nation-pair
    disjunction is applied before the final partial-aggregated
    groupBy. At 100 TB the supplier/customer nation filters would also
    be pushed into the dim scans by Catalyst (they are here: the
    broadcast sides carry only matching nationkeys).
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    od = c.orders.select("o_orderkey", "o_custkey")
    su = c.supplier.select("s_suppkey", "s_nationkey")
    cu = c.customer.select("c_custkey", "c_nationkey")
    na = c.nation.select("n_nationkey", "n_name")
    ns = na.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "ns_key"
    )
    nc = na.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "nc_key"
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        F.round(F.sum(FN.revenue_expr()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- Q8: market share -------------------------------------------------------

_Q8_ORACLE = """
WITH base AS (
    SELECT year(o.o_orderdate) AS order_year,
           CAST(l.l_extendedprice AS DECIMAL(18,6))
             * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS vol,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT order_year,
       CAST(round(
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(sum(vol) AS DOUBLE), 6) AS DOUBLE) AS mkt_share,
       CAST(round(sum(vol), 2) AS DOUBLE) AS total_volume
FROM base
GROUP BY order_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold into
    ASIA customers, by order year.

    Scale notes: the p_type filter prunes part at the scan; part,
    supplier, customer, nation×2, region are all broadcast; the
    conditional share is one pass of conditional aggregation (no
    second join or self-union). Division happens once per group in
    double after exact decimal sums — engine-identical.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    pa = c.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    su = c.supplier.select("s_suppkey", "s_nationkey")
    od = c.orders.select("o_orderkey", "o_custkey", "o_orderdate")
    cu = c.customer.select("c_custkey", "c_nationkey")
    na = c.nation
    re = c.region.filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nc = na.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = na.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = FN.revenue_expr()
    zero = F.lit(0).cast(FN.MONEY)
    j = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(re), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
    )
    g = j.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)).alias(
            "nation_vol"
        ),
        F.sum(vol).alias("all_vol"),
    )
    return g.select(
        "order_year",
        F.round(
            F.col("nation_vol").cast("double") / F.col("all_vol").cast("double"), 6
        )
        .cast("double")
        .alias("mkt_share"),
        F.round(F.col("all_vol"), 2).cast("double").alias("total_volume"),
    )


# --- Q12: lateness × priority counts ---------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY l.l_returnflag
"""


@query("q12_late_priority_lines", oracle=_Q12_ORACLE)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode→returnflag): for late-shipped lines
    (>90 days after order), count high- vs low-priority orders.

    Scale notes: single fact⋈fact equi join (the only shuffle), the
    lateness predicate is a post-join filter on already-projected
    columns, and the conditional counts are one aggregation pass.
    Integer-only output — trivially engine-exact.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select("l_orderkey", "l_returnflag", "l_shipdate")
    od = c.orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q13: customer order-count distribution ---------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by how many orders they
    placed (zero included via the left join).

    Scale notes: the heavy side (orders) pre-aggregates to one row per
    custkey BEFORE the join against customer — at 100 TB this turns a
    fact-sized join into a dim-sized one; the second groupBy is over a
    tiny distinct-count domain. Integer-only output.
    """
    c = Catalog(spark, sf_dir)
    per_cust_orders = c.orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    cu = c.customer.select("c_custkey")
    per_cust = cu.join(
        per_cust_orders, cu.c_custkey == per_cust_orders.o_custkey, "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q14: promo revenue share by month --------------------------------------

_Q14_ORACLE = """
SELECT date_trunc('month', l.l_shipdate) AS ship_month,
       CAST(round(
           100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))) AS DOUBLE),
           4) AS DOUBLE) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY date_trunc('month', l.l_shipdate)
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape, widened from one month to a monthly series:
    percentage of revenue from PROMO parts per ship month.

    Scale notes: part projects two columns and broadcasts; the share is
    conditional aggregation in one pass (no promo/non-promo
    self-union). ``100.0 * promo / total`` is evaluated in double in
    the same op order on both engines after exact decimal sums.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    pa = c.part.select("p_partkey", "p_type")
    vol = FN.revenue_expr()
    zero = F.lit(0).cast(FN.MONEY)
    g = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).alias(
                "promo_vol"
            ),
            F.sum(vol).alias("all_vol"),
        )
    )
    return g.select(
        "ship_month",
        F.round(
            F.lit(100.0)
            * F.col("promo_vol").cast("double")
            / F.col("all_vol").cast("double"),
            4,
        )
        .cast("double")
        .alias("promo_share_pct"),
    )


# --- Q19: disjunctive conjunct predicate revenue ----------------------------

_Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of (brand, size,
    quantity) conjunctive range predicates.

    Scale notes: the part-only conjuncts (brand ∈ {12,23,14}, the size
    caps) are pre-applied to the broadcast side, and the l_quantity
    range union l_quantity BETWEEN 1 AND 30 is pre-applied to the scan
    — Catalyst can push both derived filters even though the full
    predicate straddles the join. The residual disjunction evaluates
    post-join in codegen.
    """
    c = Catalog(spark, sf_dir)
    pa = c.part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#14")
    ).select("p_partkey", "p_brand", "p_size")
    li = c.lineitem.filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(cond)
        .groupBy()
        .agg(
            F.round(F.sum(FN.revenue_expr()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
