"""Zero-extra-pass pipeline metrics via ``DataFrame.observe``.

The reference's quality accounting costs extra actions — it counts,
filters, then counts again, re-reading the input each time
(``reference/jobs/02_bronze_to_silver.py:29,35``; SURVEY §3 flags the
recomputation). The engine's ``rejected_counts`` collapses that to one
aggregate pass; this module removes even that: ``observe`` piggybacks
aggregate metrics on whatever action the caller already runs (a write,
a count), so quality counters are computed WHILE the data streams to
the sink — zero additional scans, exactly-once semantics per action, at
any scale. This is the Spark-native form of a metrics sidecar; on a
cluster the same Observation values also surface in the
QueryExecutionListener for lineage/monitoring systems.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    required: Sequence[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row/null-violation counters to ``df``.

    Returns (observed_df, observation). Run ANY action on
    ``observed_df`` (typically the sink write), then read
    ``observation.get`` for::

        {"n_rows": ..., "n_rejected": ...}   # + per-column null counts

    without a second pass over the data.
    """
    obs = Observation(name)
    # Empty `required` means nothing can be rejected — F.when(None, ...)
    # would TypeError, so start from a literal False predicate.
    any_null: Column = F.lit(False)
    for c in required:
        any_null = any_null | F.col(c).isNull()
    metrics: list[Column] = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(any_null, 1).otherwise(0)).alias("n_rejected"),
    ]
    metrics += [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        for c in required
    ]
    return df.observe(obs, *metrics), obs


def observed_write_parquet(
    df: DataFrame,
    path: str,
    required: Sequence[str],
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to parquet and return the quality counters measured
    during that same write action (single scan: metrics + sink)."""
    observed, obs = with_quality_metrics(df, required)
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
