"""Round-3 analytics queries: SCD-2 history, rolling correlation,
Pareto frontier, equi-depth histogram, char-entropy quality,
chunk-level exact dedup, temperature mixture weights, interval merge,
cohort retention, transition matrix, grouped OLS, and winsorization.

Each generalizes a pattern the reference's medallion/star-schema
pipeline or a training-data curation pipeline needs next:
slowly-changing dimensions for `stations_dim` (reference
``jobs/03_silver_to_gold.py:51-65`` rebuilds the dim from scratch each
run — SCD-2 is the incremental form), co-movement analytics for the
notebook's trend charts, optimizer-grade column statistics, and two
more corpus-quality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from climate_anomaly_bigdata_pipeline_spark.operators import text as TX
from climate_anomaly_bigdata_pipeline_spark.operators import timeseries as TS
from climate_anomaly_bigdata_pipeline_spark.queries import query

# ---- SCD-2 history over the event stream ------------------------------------

_SCD2_CTES = """
flagged AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ch AS (
    SELECT user_id, event_type, ts, event_id
    FROM flagged
    WHERE prev_type IS DISTINCT FROM event_type
),
hist AS (
    SELECT user_id, event_type,
           CAST(row_number() OVER w AS BIGINT) AS version,
           ts AS effective_from,
           lead(ts) OVER w AS effective_to
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""

_SCD2_ORACLE = f"""
WITH {_SCD2_CTES}
SELECT user_id, event_type, version, effective_from, effective_to,
       (effective_to IS NULL) AS is_current
FROM hist
"""


@query("scd2_user_type_history", oracle=_SCD2_ORACLE)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 compression of each user's event-type stream: one validity
    interval per run of equal types, with version numbers and an
    is_current flag — the incremental dimension-history form of the
    reference's rebuild-from-scratch ``stations_dim``."""
    ev = Catalog(spark, sf_dir).events
    hist = TS.scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.col("version").cast("long").alias("version"),
        "effective_from",
        "effective_to",
        "is_current",
    )


# ---- trailing rolling correlation of two daily series -----------------------

# The daily pre-agg uses exact decimal sums (see rolling_daily_mean)
# so both engines window over identical doubles; corr itself runs over
# an ORDERED frame, so round(4) is stable.
_ROLLCORR_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(count(*) AS DOUBLE) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(19,4))) AS DOUBLE) / count(value)
               AS daily_avg
    FROM events
    GROUP BY CAST(ts AS DATE)
)
SELECT event_date, CAST(n_events AS BIGINT) AS n_events, daily_avg,
       CASE WHEN count(*) OVER w >= 7
            THEN round(corr(n_events, daily_avg) OVER w, 4)
       END AS corr_7d
FROM daily
WINDOW w AS (ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("rolling_corr_daily", oracle=_ROLLCORR_ORACLE)
def rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing Pearson correlation between daily event volume
    and daily mean value — does activity co-move with intensity? Same
    grain-reduce-then-window shape as rolling_daily_mean."""
    ev = Catalog(spark, sf_dir).events
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(15,4)")).cast("double")
            / F.count("value")
        ).alias("daily_avg"),
    )
    out = TS.rolling_corr(
        daily, "event_date", "n_events", "daily_avg", window=7,
        out_name="corr_7d",
    )
    return out.select(
        "event_date",
        F.col("n_events").cast("long").alias("n_events"),
        "daily_avg",
        "corr_7d",
    )


# ---- 2-D Pareto frontier (skyline) ------------------------------------------

_PARETO_ORACLE = """
WITH ranked AS (
    SELECT p_partkey, p_size, p_retailprice,
           max(p_retailprice) OVER (
               ORDER BY CAST(p_size AS DOUBLE)
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS run_max,
           max(p_retailprice) OVER (PARTITION BY p_size) AS same_max
    FROM part
)
SELECT p_partkey, p_size, p_retailprice
FROM ranked
WHERE (run_max IS NULL OR p_retailprice > run_max)
  AND p_retailprice = same_max
"""


@query("pareto_frontier_parts", oracle=_PARETO_ORACLE)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts maximizing retail price while minimizing size:
    the set of best price-for-size trade-offs, computed sort-based
    (linear) instead of the quadratic self-anti-join."""
    pt = Catalog(spark, sf_dir).part.select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return R.pareto_frontier_2d(
        pt, maximize_col="p_retailprice", minimize_col="p_size"
    )


# ---- equi-depth histogram ----------------------------------------------------

_EQUIDEPTH_ORACLE = """
WITH b AS (
    SELECT o_totalprice,
           CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
               AS bucket
    FROM orders
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM b
GROUP BY bucket
"""


@query("equidepth_hist_orders", oracle=_EQUIDEPTH_ORACLE)
def equidepth_hist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile histogram of order totals (bucket bounds +
    counts) — the optimizer-statistics twin of the fixed-width A8
    histogram."""
    od = Catalog(spark, sf_dir).orders
    return R.equi_depth_histogram(
        od, "o_totalprice", tiebreak=["o_orderkey"], nbuckets=10
    )


# ---- per-document character entropy -----------------------------------------

_ENTROPY_ORACLE = """
WITH ch AS (
    SELECT doc_id, unnest(str_split_regex(text, '')) AS ch
    FROM documents
),
cnt AS (
    SELECT doc_id, ch, count(*) AS k FROM ch GROUP BY doc_id, ch
),
tot AS (
    SELECT doc_id, sum(k) AS n, count(*) AS d FROM cnt GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(t.n AS BIGINT) AS n_chars,
       CAST(t.d AS BIGINT) AS n_distinct_chars,
       round(-sum((k / CAST(t.n AS DOUBLE)) * log2(k / CAST(t.n AS DOUBLE))), 4)
           AS char_entropy
FROM cnt c JOIN tot t USING (doc_id)
GROUP BY c.doc_id, t.n, t.d
"""


@query("char_entropy_docs", oracle=_ENTROPY_ORACLE)
def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the
    symbol-distribution quality gate that flags base64/hex blobs (high)
    and padding/repetition (low) that token-level stats miss."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    return TX.char_entropy(docs)


# ---- chunk-level exact dedup ------------------------------------------------

_CHUNK_DEDUP_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
),
st AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, 32)) AS s
    FROM toks
),
chunks AS (
    SELECT doc_id,
           CAST((s - 1) // 32 + 1 AS BIGINT) AS chunk_idx,
           md5(array_to_string(t[s:s+31], ' ')) AS chunk_md5
    FROM st
),
r AS (
    SELECT *, row_number() OVER (
                  PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx
              ) AS rn
    FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r
GROUP BY doc_id
"""


@query("chunk_dedup_docs", oracle=_CHUNK_DEDUP_ORACLE)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: split every document into 32-token
    non-overlapping chunks and keep only the corpus-wide first
    occurrence of each chunk (by (doc_id, chunk_idx)) — the passage
    dedup step that removes repeated boilerplate *within* otherwise
    distinct documents, reported as per-doc kept/total chunk counts.

    Chunker is row-local (zero shuffle); the dedup is one shuffle by
    chunk md5 — at 100 TB identical-chunk groups are bounded by
    duplication depth, not corpus size."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    chunks = TX.chunk_documents(docs, chunk_size=32, overlap=0)
    w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
    )


# ---- gaps-and-islands interval merge ----------------------------------------

_MERGE_INTERVALS_ORACLE = """
WITH iv AS (
    SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
),
m AS (
    SELECT user_id, s, e,
           max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
    FROM iv
),
isl AS (
    SELECT user_id, s, e,
           sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM m
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       min(s) AS interval_start, max(e) AS interval_end,
       CAST(count(*) AS BIGINT) AS n_merged
FROM isl
GROUP BY user_id, island
"""


@query("merge_intervals_activity", oracle=_MERGE_INTERVALS_ORACLE)
def merge_intervals_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each user's 30-minute activity spans (one per event)
    into maximal disjoint intervals — the interval-form generalization
    of sessionization (overlap-merge instead of gap-split)."""
    ev = Catalog(spark, sf_dir).events
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    out = TS.merge_intervals(iv, ["user_id"], "s", "e")
    return out.select(
        "user_id",
        F.col("island").cast("long").alias("island"),
        "interval_start",
        "interval_end",
        "n_merged",
    )


# ---- monthly cohort retention ------------------------------------------------

_COHORT_ORACLE = """
WITH am AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('month', ts) AS DATE) AS active_month
    FROM events
),
c AS (
    SELECT user_id, active_month,
           min(active_month) OVER (PARTITION BY user_id) AS cohort_month
    FROM am
),
agg AS (
    SELECT cohort_month,
           CAST(date_diff('month', cohort_month, active_month) AS BIGINT)
               AS month_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM c GROUP BY 1, 2
)
SELECT cohort_month, month_offset, n_active,
       round(CAST(n_active AS DOUBLE) /
             max(CASE WHEN month_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_month), 6) AS retention
FROM agg
"""


@query("cohort_retention_monthly", oracle=_COHORT_ORACLE)
def cohort_retention_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention triangle: users grouped by
    first-activity month, tracked by months-since-cohort, with the
    retained share of each cohort."""
    ev = Catalog(spark, sf_dir).events
    return TS.cohort_retention(ev, "user_id", "ts")


# ---- event-type transition matrix -------------------------------------------

_TRANSITION_ORACLE = """
WITH p AS (
    SELECT event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_state
    FROM events
),
c AS (
    SELECT prev_state, event_type, CAST(count(*) AS BIGINT) AS n_trans
    FROM p WHERE prev_state IS NOT NULL
    GROUP BY prev_state, event_type
)
SELECT prev_state, event_type, n_trans,
       round(CAST(n_trans AS DOUBLE) /
             sum(n_trans) OVER (PARTITION BY prev_state), 6) AS prob
FROM c
"""


@query("transition_matrix_events", oracle=_TRANSITION_ORACLE)
def transition_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event-type
    bigrams with row-normalized probabilities — the statistical twin of
    the ordered conversion funnel."""
    ev = Catalog(spark, sf_dir).events
    return TS.transition_matrix(
        ev, "user_id", "event_type", "ts", tiebreak_col="event_id"
    )


# ---- per-group OLS regression ------------------------------------------------

_LINREG_ORACLE = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
"""


@query("linreg_price_by_qty", oracle=_LINREG_ORACLE)
def linreg_price_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit of extended price against quantity
    (slope/intercept/R²) via the single-pass regr_* aggregate family —
    per-segment trend extraction without a model loop."""
    li = Catalog(spark, sf_dir).lineitem
    out = R.grouped_linreg(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    )
    return out.withColumn("n_pairs", F.col("n_pairs").cast("long"))


# ---- winsorized group statistics --------------------------------------------

_WINSORIZE_ORACLE = """
WITH b AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo_fence,
           quantile_cont(value, 0.95) AS hi_fence
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN value < lo_fence THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(sum(CASE WHEN value > hi_fence THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       round(avg(value), 4) AS mean_raw,
       round(avg(CASE WHEN value < lo_fence THEN lo_fence
                      WHEN value > hi_fence THEN hi_fence
                      ELSE value END), 4) AS mean_winsorized
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""


@query("winsorize_event_values", oracle=_WINSORIZE_ORACLE)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-event-type value statistics: clamp outside the
    exact [p5, p95] fences and compare raw vs winsorized means — the
    outlier-robust normalization gate."""
    ev = Catalog(spark, sf_dir).events
    return R.winsorize_stats(ev, ["event_type"], "value", lo=0.05, hi=0.95)


# ---- temperature-scaled mixture weights -------------------------------------

_TEMPERATURE_ORACLE = """
WITH c AS (
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER (), 6) AS weight
FROM c
"""


@query("temperature_mix_weights", oracle=_TEMPERATURE_ORACLE)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) per-source sampling weights —
    the multilingual-mix rebalancing rule; feed into mix_to_target to
    materialize the corpus."""
    docs = Catalog(spark, sf_dir).documents
    return R.temperature_mix(docs, "source", alpha=0.5)


# ---- key-skew diagnostics (the pre-join profile every 100 TB run needs) -----

_SKEW_PROFILE_ORACLE = """
WITH per_key AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
)
SELECT
    CAST(count(*) AS BIGINT) AS n_keys,
    CAST(max(cnt) AS BIGINT) AS max_cnt,
    round(avg(cnt), 4) AS avg_cnt,
    round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
    round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
    round(max(cnt) / avg(cnt), 4) AS skew_ratio
FROM per_key
"""


@query("key_skew_profile_events", oracle=_SKEW_PROFILE_ORACLE)
def key_skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics for events.user_id: per-key counts
    reduced to (n_keys, max, avg, p50, p99, max/avg ratio) — the
    profile that decides salting vs AQE-skew-join vs broadcast before a
    big shuffle. Two aggregations, both map-side partial: the per-key
    count is the same shuffle the real join would pay, and the summary
    is groups-sized. skew_ratio >> p99/avg flags a single hot key
    (salt it); p99/avg >> 1 flags a heavy tail (AQE handles it)."""
    ev = Catalog(spark, sf_dir).events
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_ratio"),
    )


# ---- market-basket co-occurrence with lift ----------------------------------

_BASKET_ORACLE = """
WITH io AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
tot AS (
    SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM io
),
pc AS (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM io GROUP BY 1
),
pairs AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           CAST(count(*) AS BIGINT) AS n_both
    FROM io a JOIN io b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
)
SELECT p1, p2, n_both,
       CAST(round(CAST(CAST(
            (n_both * tot.n) / (c1.c * c2.c)
        AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS lift
FROM pairs, tot
JOIN pc c1 ON pairs.p1 = c1.l_partkey
JOIN pc c2 ON pairs.p2 = c2.l_partkey
"""


@query("market_basket_lift", oracle=_BASKET_ORACLE)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs co-occurring in >= 2 orders, with lift
    (P(ab)/(P(a)P(b))) — market-basket / feature-co-occurrence
    analysis. Pairs are expanded IN-ROW from each order's sorted
    distinct item array (baskets are bounded, so the expansion is
    O(basket²) per row — no self-join of the item table, which is the
    quadratic trap; the oracle runs exactly that join). Item supports
    and the order total join back groups-sized."""
    from climate_anomaly_bigdata_pipeline_spark.operators import relational as R  # noqa: F401

    # The distinct (order, part) projection feeds THREE consumers (the
    # n_orders count action, the basket build, and the item supports);
    # unpinned, each one re-runs the fact-sized distinct shuffle.
    # One localCheckpoint turns that into one distinct + two
    # block-reads (guide §2.4). Measured 2.78 -> ~1.9 s isolated-warm.
    io = (
        Catalog(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()
    )
    n_orders = io.select("l_orderkey").distinct().count()
    baskets = io.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("items") - 2, F.lit(0))),
            lambda i: F.transform(
                F.slice(
                    F.col("items"),
                    i + F.lit(2),
                    F.greatest(F.size("items") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    F.col("items")[i].alias("p1"), y.alias("p2")
                ),
            ),
        )
    )
    pairs = (
        baskets.filter(F.size("items") >= 2)
        .select(F.explode(pair_structs).alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    pc = io.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    out = (
        pairs.join(pc.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1")), "p1")
        .join(pc.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2")), "p2")
    )
    lift = (F.col("n_both") * F.lit(float(n_orders))) / (F.col("c1") * F.col("c2"))
    return out.select(
        "p1", "p2", "n_both", F.round(lift, 6).alias("lift")
    )


# ---- CDC snapshot diff (changed-column detection) ---------------------------

_CDC_ORACLE = """
WITH snap_a AS (
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer
    WHERE c_custkey % 97 <> 0
),
snap_b AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 13 = 0 THEN concat(c_name, ' jr') ELSE c_name
           END AS c_name,
           c_nationkey,
           CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 100.0, 2)
                ELSE round(c_acctbal, 2) END AS c_acctbal
    FROM customer
    UNION ALL
    SELECT c_custkey + 9000000, c_name, c_nationkey, round(c_acctbal, 2)
    FROM customer WHERE c_custkey % 101 = 0
),
j AS (
    SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
           a.c_custkey IS NOT NULL AS in_a, b.c_custkey IS NOT NULL AS in_b,
           a.c_name IS DISTINCT FROM b.c_name AS d_name,
           a.c_nationkey IS DISTINCT FROM b.c_nationkey AS d_nation,
           a.c_acctbal IS DISTINCT FROM b.c_acctbal AS d_acctbal
    FROM snap_a a FULL OUTER JOIN snap_b b USING (c_custkey)
)
SELECT c_custkey,
       CASE WHEN NOT in_a THEN 'insert'
            WHEN NOT in_b THEN 'delete'
            ELSE 'update' END AS change_type,
       concat_ws(',',
           CASE WHEN in_a AND in_b AND d_name THEN 'c_name' END,
           CASE WHEN in_a AND in_b AND d_nation THEN 'c_nationkey' END,
           CASE WHEN in_a AND in_b AND d_acctbal THEN 'c_acctbal' END
       ) AS changed_cols
FROM j
WHERE NOT in_a OR NOT in_b OR d_name OR d_nation OR d_acctbal
"""


@query("cdc_snapshot_diff", oracle=_CDC_ORACLE)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: one full-outer
    join on the key classifies every row as insert / delete / update
    and names exactly which columns changed (null-safe comparison per
    column — the payload a MERGE INTO or downstream cache invalidation
    needs). Snapshots are deterministic mutants of customer (renames,
    balance bumps, deletes, inserts). One shuffle by key; per-column
    diffs are row-local expressions, so width scales free."""
    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    snap_a = c.filter(F.col("c_custkey") % 97 != 0)
    snap_b = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, F.concat(F.col("c_name"), F.lit(" jr")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        "c_nationkey",
        F.when(F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 101 == 0).select(
            (F.col("c_custkey") + 9000000).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
        )
    )
    a = snap_a.select(
        "c_custkey", *[F.col(x).alias(f"a_{x}") for x in ["c_name", "c_nationkey", "c_acctbal"]]
    )
    b = snap_b.select(
        "c_custkey", *[F.col(x).alias(f"b_{x}") for x in ["c_name", "c_nationkey", "c_acctbal"]]
    )
    j = a.join(b, "c_custkey", "full_outer")
    # presence proxy: snapshot payload columns are non-null by
    # construction, so all-null payload == side absent (at scale, carry
    # an explicit presence literal per side instead)
    in_a = F.col("a_c_name").isNotNull() | F.col("a_c_nationkey").isNotNull() | F.col(
        "a_c_acctbal"
    ).isNotNull()
    in_b = F.col("b_c_name").isNotNull() | F.col("b_c_nationkey").isNotNull() | F.col(
        "b_c_acctbal"
    ).isNotNull()
    diffs = {
        x: ~F.col(f"a_{x}").eqNullSafe(F.col(f"b_{x}"))
        for x in ["c_name", "c_nationkey", "c_acctbal"]
    }
    change = (
        F.when(~in_a, "insert").when(~in_b, "delete").otherwise("update")
    )
    changed_cols = F.concat_ws(
        ",", *[F.when(in_a & in_b & d, F.lit(x)) for x, d in diffs.items()]
    )
    any_diff = diffs["c_name"] | diffs["c_nationkey"] | diffs["c_acctbal"]
    return j.filter(~in_a | ~in_b | any_diff).select(
        "c_custkey", change.alias("change_type"), changed_cols.alias("changed_cols")
    )


# ---- PageRank over the purchase graph ---------------------------------------

_PR_DAMPING = 0.85
_PR_ITERS = 3
_PR_TOPK = 20


def _pagerank_oracle(n_iter: int) -> str:
    """Unrolled-iteration SQL twin of ``graph.pagerank`` (same recipe
    as the IVF training CTEs): DECIMAL contribution sums, double
    damping arithmetic — bit-identical per iteration."""
    d = _PR_DAMPING
    ctes = [
        """base AS (
    SELECT DISTINCT o_custkey AS a, -(l_suppkey + 1) AS b
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
    SELECT a AS src, b AS dst FROM base UNION SELECT b, a FROM base
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""r{i} AS (
    SELECT nodes.node,
           (1 - {d}) / (SELECT n FROM nn)
           + {d} * COALESCE(CAST(s.s AS DOUBLE), 0.0) AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node,
               sum(CAST(r.rank / d.outdeg AS DECIMAL(30,18))) AS s
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) s ON s.node = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node,
       CAST(round(CAST(CAST(rank AS VARCHAR) AS DECIMAL(38,18)), 10)
            AS DOUBLE) AS rank
FROM r{n_iter}
ORDER BY rank DESC, node
LIMIT {_PR_TOPK}"""
    )


@query("pagerank_purchase_graph", oracle=_pagerank_oracle(_PR_ITERS))
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the bipartite customer↔supplier
    purchase graph (edges both directions, so no dangling mass): which
    suppliers sit at the center of the order flow. 3 synchronous
    iterations of ``graph.pagerank`` — the canonical iterative-Spark
    loop (join + keyed sum per round, lazily checkpointed lineage),
    with DECIMAL contribution sums making every iteration bit-identical
    to the oracle's unrolled SQL twin. Top-20 by (rank, node)."""
    from climate_anomaly_bigdata_pipeline_spark.operators import graph as G

    c = Catalog(spark, sf_dir)
    base = (
        c.orders.join(
            c.lineitem, c.lineitem["l_orderkey"] == c.orders["o_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("a"),
            (-(F.col("l_suppkey") + 1)).alias("b"),
        )
        .distinct()
    )
    # base is distinct and the reversed copy can't collide with the
    # forward one (customer nodes are their custkeys >= 0, supplier
    # nodes STRICTLY negative via -(suppkey+1) — disjoint at EVERY
    # scale factor, unlike a fixed additive offset that custkey
    # outgrows at SF~7). The +1 shift matters: keys start at 0, and a
    # bare negation maps supplier 0 onto customer 0 — merging the two
    # into one node and, when customer 0 buys from supplier 0, minting
    # a (0,0) self-loop that UNION DISTINCT dedups but UNION ALL keeps
    # twice (caught by the sf0.001 sweep: 2887 vs 2888 edges). With
    # the shift the union is provably duplicate-free — the oracle's
    # UNION DISTINCT dedups nothing and Spark needn't shuffle for it.
    edges = base.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        base.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # The rank table is |customers|+|suppliers| rows — dimension-sized,
    # inside the broadcast threshold at any SF this engine targets per
    # executor; the operator's shuffle-join default remains the
    # unbounded-|V| path.
    ranks = G.pagerank(
        edges, damping=_PR_DAMPING, n_iter=_PR_ITERS, broadcast_ranks=True
    )
    return (
        ranks.select("node", F.round(F.col("rank"), 10).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(_PR_TOPK)
    )


# ---- point-in-time join against the SCD-2 history -----------------------------

# The dimensional-correctness trap every lakehouse interview asks
# about (round 11): attribute each purchase to the user's type REGIME
# one hour BEFORE the purchase, per the SCD-2 history — a true
# point-in-time (as-of backward) join, not a current-row join. The
# 1-hour lag makes it non-degenerate (at the purchase instant the
# regime is trivially 'purchase'); purchases whose user has no regime
# ≥ 1 h old yet are dropped (inner as-of semantics, documented).
# Semantics pinned in BOTH engines: among regimes with
# effective_from <= t, take the greatest effective_from, ties to the
# highest version — the oracle's QUALIFY pick and asof_join's
# (ts, version) window order are the same rule. Scale shape: the
# engine side is the tag+union+one-window as-of composition
# (O((L+R) log(L+R)), one hash shuffle on user_id — never the
# O(L×R)-per-key inequality join the oracle runs), then a grouped
# rollup with the standard DECIMAL money sum.
_PIT_ORACLE = f"""
WITH {_SCD2_CTES},
p AS (
    SELECT event_id, user_id, ts - INTERVAL 1 HOUR AS t, value
    FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT p.event_id, p.value,
           h.event_type AS prior_type, h.effective_from, h.version
    FROM p JOIN hist h
      ON h.user_id = p.user_id AND h.effective_from <= p.t
),
pick AS (
    SELECT event_id, value, prior_type FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY event_id
        ORDER BY effective_from DESC, version DESC
    ) = 1
)
SELECT prior_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(round(sum(CAST(value AS DECIMAL(19,4))), 2) AS DOUBLE)
           AS value_sum
FROM pick GROUP BY prior_type ORDER BY prior_type
"""


@query("pit_prior_regime_purchases", oracle=_PIT_ORACLE)
def pit_prior_regime_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What was the user doing an hour before buying? Purchases
    attributed to the SCD-2 type regime effective at ts − 1 h via a
    true point-in-time (as-of backward) join; grouped purchase counts
    and exact-DECIMAL value per prior regime (see the comment block)."""
    ev = Catalog(spark, sf_dir).events
    hist = TS.scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_col="event_id",
    ).select(
        "user_id",
        F.col("event_type").alias("prior_type"),
        "effective_from",
        F.col("version").cast("long").alias("version"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("t"),
        "value",
    )
    j = TS.asof_join(
        p, hist, by=["user_id"], left_ts="t",
        right_ts="effective_from", right_tiebreak="version",
    )
    return (
        j.groupBy("prior_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(19,4)")), 2)
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("prior_type")
    )
