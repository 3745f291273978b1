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


# ---- PNG encode→decode profile ----------------------------------------------

# Deterministic synthetic images: each doc renders a constant greyscale
# image whose dims/level derive from doc_id, so the DECODED profile is
# SQL-predictable and the whole compressed-codec path (zlib deflate →
# inflate, scanline filters cycling through all five types) sits under
# a hash-exact oracle. Constant integer pixels make mean_luma exact
# (integer sums — no FP rounding hazard).
_PNG_DECODE_ORACLE = """
SELECT doc_id,
       'L' AS mode,
       CAST(8 + doc_id % 9 AS INTEGER) AS width,
       CAST(4 + doc_id % 5 AS INTEGER) AS height,
       CAST(doc_id % 256 AS DOUBLE) AS mean_luma
FROM documents
"""


@query("png_decode_profile", oracle=_PNG_DECODE_ORACLE)
def png_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-image decode, end to end on the executors: every doc
    renders a deterministic greyscale PNG (stdlib-zlib encoder, scanline
    filter type cycling by row so all five filters are exercised), and
    ``decode_image`` (Arrow-batched mapInPandas) inflates + unfilters it
    back to (mode, width, height, mean_luma). The oracle predicts the
    decoded profile in SQL — the round trip is lossless, so the decoded
    dims and constant-image luma are exact. The real-corpus analog:
    payloads come off parquet instead of being rendered; the decode
    plumbing is identical."""
    import numpy as np
    import pandas as pd

    from collections.abc import Iterator

    docs = Catalog(spark, sf_dir).documents.select("doc_id")

    def render(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w, h = 8 + doc_id % 9, 4 + doc_id % 5
                arr = np.full((h, w), doc_id % 256, dtype=np.uint8)
                payloads.append(MM.encode_png(arr, filters="cycle"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    images = docs.mapInPandas(render, schema="doc_id long, payload binary")
    return MM.decode_image(images)
