"""End-to-end training-mix curation pipeline: the engine's north-star
operators composed the way a real pretraining data pipeline chains
them — dedup → quality filter → per-source quota → split — verified as
ONE plan against a single SQL oracle.

Composition is the point: each stage is an already-oracle-checked
operator (fingerprint/dedup_exact/repetition_stats/quota_per_group/
hash_split); this query certifies they compose without coupling
assumptions. Shuffle budget of the whole pipeline: fingerprint dedup
(1, by fingerprint) + quota (1, by source) + final rollup (1) — the
quality stats and split label ride along row-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from climate_anomaly_bigdata_pipeline_spark.operators import text as TX
from climate_anomaly_bigdata_pipeline_spark.queries import query

_CURATION_ORACLE = r"""
WITH corpus AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, source
    FROM documents WHERE doc_id % 5 = 0
),
fp AS (
    SELECT *,
           md5(array_to_string(str_split_regex(lower(trim(text)), '\s+'), ' '))
               AS fingerprint
    FROM corpus
),
kept AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id)
                      AS rn
        FROM fp
    ) WHERE rn = 1
),
stats AS (
    SELECT doc_id, source,
           len(t) AS n_tokens,
           round(len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) AS ttr
    FROM (
        SELECT doc_id, source, str_split_regex(lower(trim(text)), '\s+') AS t
        FROM kept
    )
),
quality AS (
    SELECT * FROM stats WHERE n_tokens >= 40 AND ttr >= 0.4
),
quota AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
                      PARTITION BY source
                      ORDER BY md5(concat('quota:', CAST(doc_id AS VARCHAR))),
                               doc_id
                  ) AS qr
        FROM quality
    ) WHERE qr <= 20
),
labeled AS (
    SELECT *,
           CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                     CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90
                     THEN 'train'
                WHEN CAST(concat('0x', substr(md5(concat('split:',
                     CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 95
                     THEN 'val'
                ELSE 'test'
           END AS split
    FROM quota
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM labeled
GROUP BY split, source
"""


@query("curation_pipeline", oracle=_CURATION_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation chain on a corpus with injected duplicates (every
    5th doc re-appears under a new id): md5-fingerprint dedup
    keep-first → quality gate (n_tokens >= 40, TTR >= 0.4) →
    per-source quota (<= 20) → 90/5/5 hash split → per-(split, source)
    doc and token counts."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text", "source")
    dupes = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dupes)

    deduped = R.dedup_exact(
        TX.fingerprint(corpus), keys=["fingerprint"], order=[F.col("doc_id")]
    )
    stats = TX.repetition_stats(deduped)  # doc_id, n_tokens, ttr, ...
    quality = (
        deduped.join(stats.select("doc_id", "n_tokens", "ttr"), "doc_id")
        .filter((F.col("n_tokens") >= 40) & (F.col("ttr") >= 0.4))
    )
    capped = R.quota_per_group(quality, ["source"], "doc_id", 20)
    labeled = R.hash_split(capped, "doc_id")
    return labeled.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
