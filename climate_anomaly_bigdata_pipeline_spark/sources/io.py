"""Dataset I/O: layer reads/writes and edge exports (SURVEY §2.1 S3-S7).

Mirrors the reference's storage contract — Parquet between layers,
single-file CSV at the BI edge — with the scale fixes SURVEY §4 calls
for: partitioned gold writes (partition pruning at 100 TB) and lineage
stamping in one projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-text scan (S3): whole lines as ``value: string``."""
    return spark.read.text(path)


def with_lineage(df: DataFrame, source: str) -> DataFrame:
    """Stamp ingest lineage (S7): ``ingestion_date`` + ``source``
    (``jobs/01_ingest_to_bronze.py:19-20``)."""
    return df.withColumn("ingestion_date", F.current_timestamp()).withColumn(
        "source", F.lit(source)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """Parquet sink (S5). Pass ``partition_by`` for gold-layer facts —
    the reference writes unpartitioned (SURVEY §4), which forfeits
    partition pruning; at 100 TB always partition on the prune key
    (e.g. year)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_single_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file CSV export (S6, ``jobs/03_silver_to_gold.py:5-17``).

    ``coalesce(1)`` is a deliberate anti-parallelism choice for BI
    hand-off — edge-only; never use upstream of further computation.
    """
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("header", "true")
        .option("delimiter", ",")
        .option("encoding", "UTF-8")
        .csv(path)
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered Parquet sink: global range-partition on
    ``cluster_col`` then sort within each partition before writing.
    Every output file covers a disjoint, internally-sorted key range,
    so parquet row-group min/max statistics prune file scans for range
    predicates on the cluster key — the single-column analog of
    Z-ordering, and the layout that turns "scan 100 TB" into "scan the
    3 files whose [min,max] overlap the predicate".

    One range-exchange (sampled boundaries) + local sort; no global
    sort bottleneck — each writer task sorts only its own range.
    """
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """JSON-lines sink (one JSON object per line, the lingua franca of
    LLM training-data interchange). Splittable and append-friendly like
    the parquet sink; prefer parquet between layers (typed, columnar,
    ~5-10x smaller) and JSONL only at ingest/egress edges."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Always pass ``schema`` at scale: schema
    inference is a full extra pass over the data (a 100 TB corpus read
    twice); with an explicit schema the scan is single-pass and
    malformed lines null out per PERMISSIVE mode instead of failing."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
