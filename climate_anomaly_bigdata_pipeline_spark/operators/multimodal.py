"""Multimodal column plumbing (SURVEY §2.10): opaque binary payloads +
typed metadata, with Arrow-batched decode/feature-extract operators.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct — they flow through joins/aggregations untouched.
Heavy per-item work (decode, resize, frame-sample) runs in
``mapInPandas`` (Arrow batches, no per-row Python overhead). The
actual codecs aren't in this container, so decode is STUBBED two ways:

* :func:`binary_features` — a *pure-expression* deterministic feature
  set (byte length, md5 digest) used as the oracle-checkable stand-in.
* :func:`extract_features_batched` — the same features computed inside
  ``mapInPandas``: the real plumbing (schema, batch iteration,
  Arrow transfer) with a deterministic fake payload analysis. Tests
  assert it matches the expression path bit-for-bit.
* :func:`decode_image` / :func:`resize_image` / :func:`sample_frames`
  — clearly-marked ``NotImplementedError`` stubs behind an import-try
  for the real libraries (PIL / av), keeping signatures and schemas
  real.

Scale notes: binary payloads dominate row size — repartition by a
content-derived key before wide shuffles so AQE can split skewed
batches, and always select the metadata struct (not the payload) into
aggregation-only subplans so column pruning drops the bytes at the scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of feature extraction — shared by the expression path
#: and the mapInPandas path.
FEATURE_SCHEMA = "doc_id long, content_type string, n_bytes int, digest string"


def attach_binary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    content_type: str = "application/octet-stream",
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct
    (here UTF-8 bytes of a text column stand in for image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(content_type).alias("content_type"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pure-expression feature extraction over the payload: byte count
    and md5 digest — deterministic, engine-portable, no Python."""
    return df.select(
        F.col(id_col),
        F.col("meta.content_type").alias("content_type"),
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


def extract_features_batched(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The same features via ``mapInPandas`` — the Arrow-batched shape a
    real decoder plugs into (swap the body for PIL/libav calls)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content_type": [m["content_type"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def _require(module: str):
    try:
        return __import__(module)
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"STUB: real decode requires '{module}', which is not installed "
            "in this container. The Spark-side plumbing (schema, "
            "mapInPandas batching, partitioning) is real and tested via "
            "extract_features_batched."
        ) from e


def decode_image(df: DataFrame) -> DataFrame:
    """STUB — decode payload bytes to (width, height, mode) via PIL."""
    _require("PIL")
    raise NotImplementedError("unreachable: PIL absent in this container")


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — resize decoded images via PIL, returning new payloads."""
    _require("PIL")
    raise NotImplementedError("unreachable: PIL absent in this container")


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — sample every-nth video frame via PyAV."""
    _require("av")
    raise NotImplementedError("unreachable: av absent in this container")
