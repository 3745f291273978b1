"""Mergeable-sketch helpers: Count-Min point queries with a
version-proof fallback, and a DataFrame-native CMS.

``F.count_min_sketch`` (public SQL aggregate) returns serialized
sketch BYTES; Spark exposes no Python/SQL point-query function, so
reading an estimate needs the JVM class
``org.apache.spark.util.sketch.CountMinSketch`` via the py4j gateway —
a private surface (`spark._jvm`) that can move across Spark minors.
:func:`cms_estimates` wraps that access in a guarded call and, when it
fails, falls back to :func:`cms_estimates_df`: a pure-DataFrame
Count-Min table built with the engine-portable md5 hash family
(``operators/dedup.md5_hash32``). The fallback satisfies the same CMS
contract (estimate never below the true count; above it by at most
eps*N with the configured confidence, per query) because it IS a
Count-Min sketch — only the hash family differs — so bound
certificates computed from either path are valid.

The DataFrame CMS is also the 100 TB shape on its own: depth*width
counter cells as rows, one explode + one keyed aggregation, fully
map-side partial, no driver state beyond the queried items.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators.dedup import md5_hash32


def cms_dims(eps: float, confidence: float) -> tuple[int, int]:
    """(depth, width) for the standard CMS guarantees: overestimate
    ≤ eps*N with probability ≥ confidence."""
    width = int(math.ceil(math.e / eps))
    depth = int(math.ceil(math.log(1.0 / (1.0 - confidence))))
    return depth, width


def _md5_bucket_py(value: str, seed: int, width: int) -> int:
    """Driver-side twin of ``md5_hash32(col, seed) % width`` — same md5
    recipe, so item bucketing matches the DataFrame table exactly."""
    h = hashlib.md5(f"{seed}:{value}".encode()).hexdigest()
    return int(h[:8], 16) % width


def cms_estimates_df(
    df: DataFrame,
    col: str,
    items: list,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> dict:
    """Count-Min estimates for ``items`` from a DataFrame-built sketch.

    One explode (depth rows per input row) + one (row, bucket) count —
    both map-side combinable — then the bounded item list probes its
    depth buckets driver-side (buckets computed with the same md5
    recipe in Python) and takes the per-item minimum: textbook CMS,
    expressed relationally. The counter table is depth*width rows
    (eps=0.001, conf=0.99: 5*2719), independent of data size."""
    depth, width = cms_dims(eps, confidence)
    cell = [
        F.struct(
            F.lit(d).alias("d"),
            (md5_hash32(F.col(col).cast("string"), seed + d) % width).alias("b"),
        )
        for d in range(depth)
    ]
    table = (
        df.select(F.explode(F.array(*cell)).alias("e"))
        .groupBy(F.col("e.d").alias("d"), F.col("e.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    import functools
    import operator

    probes: dict = {}
    for it in items:
        for d in range(depth):
            probes.setdefault(
                (d, _md5_bucket_py(str(it), seed + d, width)), []
            ).append(it)
    if not probes:  # no items: nothing to probe (reduce() would raise)
        return {}
    cond = functools.reduce(
        operator.or_,
        [(F.col("d") == d) & (F.col("b") == b) for d, b in probes],
    )
    cells = {(r["d"], r["b"]): r["cnt"] for r in table.filter(cond).collect()}
    # A bucket no row ever touched is an (absent) zero cell — the min
    # must see it, or a never-occurring item would over-estimate.
    return {
        it: min(
            cells.get((d, _md5_bucket_py(str(it), seed + d, width)), 0)
            for d in range(depth)
        )
        for it in items
    }


def quantile_digest_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    n_bins: int = 512,
    total_label: str = "__total__",
    bounds: tuple | None = None,
) -> DataFrame:
    """Mergeable quantile digests with a per-group + grand-total rollup
    — the quantile member of the sketch family next to HLL
    (hll_sketch_rollup) and CMS (cms_heavy_hitters).

    The digest is a fixed-edge histogram: (group, bin) → count, built
    in ONE scan. Unlike ``percentile_approx`` — whose Greenwald-Khanna
    partials Spark never exposes as values — these digests are
    first-class rows, and merging is literally ``sum(count) GROUP BY
    bin``: the grand-total quantiles here are computed from the
    per-group digests, no second pass over the data. At 100 TB this is
    the store-per-day/merge-at-query-time telemetry shape.

    Quantile read-off per digest: cumulative counts over the ≤n_bins
    rows, locate the bin holding the target rank, interpolate inside
    it. Because bin EDGES are shared and cumulative counts at edges are
    exact, the estimate sits in the same bin interval as the true
    order statistic: |estimate − exact| ≤ (max−min)/n_bins in value
    space, deterministically (the certificate the rollup queries
    assert; interpolation between order statistics can straddle one
    bin boundary, so callers use a few-bin tolerance).

    Returns one row per group plus ``total_label``:
    (group, n, q_<q> estimate per requested quantile).
    """
    from pyspark.sql import Window

    if bounds is None:
        row = df.agg(
            F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
        ).first()
        bounds = (row["mn"], row["mx"])
    if bounds[0] is None:  # empty/all-null input: empty digest, not a crash
        mn, w = 0.0, 1.0
    else:
        mn, mx = float(bounds[0]), float(bounds[1])
        w = (mx - mn) / n_bins if mx > mn else 1.0

    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - mn) / w).cast("int")),
    )
    digests = (
        df.select(F.col(group_col).alias("g"), bin_expr.alias("bin"))
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # THE MERGE: grand total digest = per-group digests summed by bin.
    merged = digests.groupBy("bin").agg(F.sum("cnt").alias("cnt")).select(
        F.lit(total_label).alias("g"), "bin", "cnt"
    )
    alldig = digests.unionByName(merged)

    win = Window.partitionBy("g").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = alldig.withColumn("cum", F.sum("cnt").over(win)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("g"))
    )
    # For each quantile: target rank r = 1 + q*(n-1) (quantile_cont
    # convention); the holding bin is the first with cum >= r.
    outs = [F.max("n").alias("n")]
    for q in quantiles:
        r = 1 + F.lit(q) * (F.col("n") - 1)
        in_bin = F.when(
            (F.col("cum") >= r) & ((F.col("cum") - F.col("cnt")) < r),
            mn
            + (F.col("bin") + (r - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
            * w,
        )
        outs.append(F.max(in_bin).alias(f"q_{int(q * 100)}"))
    return cum.groupBy("g").agg(*outs)


def cms_estimates(
    spark: SparkSession,
    sketch_bytes: bytes,
    items: list,
    fallback: tuple[DataFrame, str] | None = None,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> dict:
    """Point-query ``items`` against a serialized Spark CMS, surviving
    the loss of the private JVM surface: if ``spark._jvm`` access fails
    (minor-version drift, connect-mode session), rebuild the estimates
    with :func:`cms_estimates_df` over ``fallback = (df, col)``."""
    try:
        cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(sketch_bytes)
        )
        return {it: cms.estimateCount(it) for it in items}
    except Exception:
        if fallback is None:
            raise
        df, col = fallback
        return cms_estimates_df(
            df, col, items, eps=eps, confidence=confidence, seed=seed
        )
