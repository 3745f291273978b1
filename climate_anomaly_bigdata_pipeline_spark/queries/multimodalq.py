"""Multimodal-column query: binary payload profiling (SURVEY §2.10).

The expression path (length + md5 over binary) is oracle-checkable;
the mapInPandas decode plumbing is verified in tests against this same
output (bit-identical), standing in for codec work the container can't
run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import multimodal as MM
from climate_anomaly_bigdata_pipeline_spark.queries import query

# DuckDB's md5 takes VARCHAR only; since the payload is exactly the
# UTF-8 bytes of `text`, md5(text) hashes the same bytes as Spark's
# md5(binary payload) — identical digests.
_BINARY_PROFILE_ORACLE = """
SELECT
    source,
    count(*) AS n_docs,
    CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
    count(DISTINCT md5(text)) AS distinct_payloads,
    min(octet_length(encode(text))) AS min_bytes,
    max(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY source
"""


@query("multimodal_binary_profile", oracle=_BINARY_PROFILE_ORACLE)
def multimodal_binary_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source profile of opaque binary payloads: the payload column
    flows through the aggregation while column pruning keeps the bytes
    out of any subplan that only needs metadata."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source", "text")
    with_bin = MM.attach_binary(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return with_bin.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.countDistinct(F.md5("payload")).alias("distinct_payloads"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
