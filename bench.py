"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop sink (computes every output
column and row — unlike count(), which Catalyst can satisfy without
materializing projections).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
from climate_anomaly_bigdata_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# Array-heavy queries (embedding pair joins) allocate GBs of transient
# garbage; after ~40 queries an 8g heap spends its time in full GC and
# timings swing 10x. Default the bench JVM to a heap sized for the box.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # Warm the JVM/codegen paths (join, window, agg) on synthetic data so
    # the first timed query isn't charged for session spin-up and JIT.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = spark.range(500_000).withColumn("k", F.col("id") % 100)
    b = spark.range(100).withColumnRenamed("id", "k2")
    w = Window.partitionBy("k").orderBy("id")
    force(
        a.join(F.broadcast(b), a.k == b.k2)
        .withColumn("rn", F.row_number().over(w))
        .groupBy("k")
        .agg(F.sum("id").alias("s"), F.avg("rn").alias("m"))
    )

    # Per-query min over N passes: the host shows bursty CPU steal
    # (shared machine), which can inflate a single pass 10x. The min is
    # the steady-state cost of the plan — the quantity that actually
    # predicts cluster behavior.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
