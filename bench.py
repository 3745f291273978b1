"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "cpus": N, "parallelism": N}.

Each query is forced end-to-end with a noop sink (computes every output
column and row — unlike count(), which Catalyst can satisfy without
materializing projections).

Contract notes (round 14):

* ``cpus`` echoes $SPARK_GRAFT_CPUS and ``parallelism`` echoes the
  live ``sparkContext.defaultParallelism`` so a reader can verify the
  core count was applied (it always was — master=local[CPUS],
  shuffle_partitions=CPUS — but the artifact never SHOWED it).
* The one-line JSON is the LAST stdout line. Driver-side stdout
  truncation can decapitate it (it happened to BENCH_r12.json); the
  COMPLETE map of every full run is also written to ``BENCH_full.json``
  next to this file — that committed file is the canonical per-query
  map for truncation recovery.
* Full runs WIPE the offline-artifact store first and time the cold
  artifact builds (IVF/PQ codebook training, gold layout writes) as
  explicit ``*_cold`` rows, so the canonical map carries the
  training/layout cost exactly once instead of never (VERDICT r13).
  The registry rows named ``*_train_*``/``bucketed_*`` keep their
  serving-path (warm reload) meaning. Set SPARK_GRAFT_BENCH_COLD=0 to
  skip the wipe when iterating locally.
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


def read_cpu() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat — (0, 0) when
    unavailable so steal detection degrades to a no-op."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0, 0


def timed(fn, spark) -> tuple[float, float]:
    """(wall seconds, steal fraction) for one end-to-end execution."""
    tot0, st0 = read_cpu()
    t0 = time.perf_counter()
    force(fn(spark, SF_DIR))
    dt = time.perf_counter() - t0
    tot1, st1 = read_cpu()
    steal = (st1 - st0) / max(tot1 - tot0, 1)
    return dt, steal


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

    # Per-query min over N passes, with the passes INTERLEAVED across
    # the whole query list (pass 1 of every query, then pass 2, ...).
    # The host shows multi-minute bursty CPU-steal windows (shared
    # machine) that can inflate a pass 10x; back-to-back passes of the
    # same query sit inside one steal window and both get poisoned,
    # while interleaved passes are minutes apart so the min survives.
    # A pass that overlapped measurable steal (/proc/stat delta) is
    # additionally retried, bounded by SPARK_GRAFT_BENCH_RETRIES.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    queries = (
        {n: QUERIES[n] for n in only.split(",") if n in QUERIES}
        if only
        else QUERIES
    )
    # Codec-family isolation (VERDICT r11 #3): the per-payload decode
    # profiles time pure-Python/Arrow work whose cost in the one-JVM
    # suite swings 5x with accumulated GC debt from the ~190 preceding
    # array-heavy queries (jpeg and flac literally swap places between
    # canonical maps with no code change). On a FULL run they are
    # benched in their own fresh JVM subprocess and merged back, so
    # the canonical map records the plan's cost, not the suite's heap
    # history. Subset runs (SPARK_GRAFT_BENCH_ONLY) keep one JVM.
    codec_names = [
        n
        for n in (
            "jpeg_decode_profile",
            "jpeg_progressive_profile",
            "png_decode_profile",
            "flac_decode_profile",
            "flac_lpc_decode_profile",
            "wav_decode_profile",
            "phash_image_dedup",
            "audio_fingerprint_dedup",
            "video_scene_cuts",
            "video_frame_sample_profile",
        )
        if n in queries
    ]
    if not only and codec_names:
        queries = {n: f for n, f in queries.items() if n not in codec_names}
    # Subset-JVM warm-up (VERDICT r12 #3): the codec-family subprocess
    # starts a COLD JVM with only ~10 queries and few passes to
    # amortize it — its sub-3 s members were paying 2.3-2.6x
    # python-worker spin-up / Arrow JIT / codegen tax on the timed
    # pass (video_scene_cuts 1.09 -> 2.82 s in r12). One untimed pass
    # of every subset query first, so every timed pass is warm;
    # failures are ignored here because the timed loop below records
    # the real error.
    if only:
        for _name, fn in queries.items():
            try:
                force(fn(spark, SF_DIR))
            except Exception:  # noqa: BLE001
                pass
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    steal_max = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "0.05"))
    max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "1"))
    best: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Artifact-store honesty (VERDICT r13 #1/#4): on a FULL run, wipe
    # the offline-artifact store and time the cold builds as explicit
    # rows, so training/layout cost appears in the canonical map ONCE.
    # Timed once (cold is cold — after the build the store is warm and
    # a re-run would measure the reload); each build is a real Spark
    # job over the parquet inputs, not a replayed result.
    if not only and os.environ.get("SPARK_GRAFT_BENCH_COLD", "1") != "0":
        import shutil

        from climate_anomaly_bigdata_pipeline_spark.queries import (
            similarityq as _simq,
        )
        from climate_anomaly_bigdata_pipeline_spark.queries import (
            storageq as _stq,
        )
        from climate_anomaly_bigdata_pipeline_spark.sources.artifacts import (
            artifact_dir,
        )

        shutil.rmtree(artifact_dir(), ignore_errors=True)
        for cold_name, cold_fn in (
            ("ivf_train_cold", lambda: _simq._ivf_codebook(spark, SF_DIR)),
            ("pq_train_cold", lambda: _simq._pq_books(spark, SF_DIR)),
            (
                "gold_fact_layout_cold",
                lambda: _stq.ensure_partitioned_fact(spark, SF_DIR),
            ),
            (
                "bucketed_layout_cold",
                lambda: _stq.ensure_bucketed_join_tables(spark, SF_DIR),
            ),
        ):
            t0 = time.perf_counter()
            try:
                cold_fn()
            except Exception as exc:  # noqa: BLE001
                errors[cold_name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            best[cold_name] = round(time.perf_counter() - t0, 3)
    retries_left: dict[str, int] = {name: max_retries for name in queries}
    for _ in range(runs):
        for name, fn in queries.items():
            # One broken query must never zero the whole bench: record
            # the failure and keep timing the rest.
            try:
                dt, steal = timed(fn, spark)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            errors.pop(name, None)
            # Trial hygiene: python gc releases DataFrame references so
            # the ContextCleaner can drop localCheckpoint blocks (the
            # ~190 checkpointing queries otherwise accumulate block-
            # manager state: jpeg_decode_profile measured 11.9 s late-
            # suite vs 1.2 s isolated before this collect).
            # Deliberately NOT calling JVM System.gc() here: a full GC
            # per query on this heap bleeds concurrent-GC phases into
            # the NEXT measured query (tried; it manufactured 7-9 s
            # spikes on sub-second queries). The residual effect is
            # that the first heavy Arrow/python stage after a run of
            # JVM-only queries can absorb a major GC (~+1-3 s on
            # jpeg_decode_profile) — a measurement artifact of the
            # one-JVM suite, not a plan property (isolated runs and
            # BASELINE.md record the true cost).
            import gc

            gc.collect()
            while steal > steal_max and retries_left[name] > 0:
                retries_left[name] -= 1
                try:
                    rdt, steal = timed(fn, spark)
                except Exception:  # noqa: BLE001
                    break
                dt = min(dt, rdt)
            best[name] = min(best.get(name, dt), dt)
    timings = {name: round(v, 3) for name, v in best.items()}

    if not only and codec_names:
        import subprocess

        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(codec_names)
        env["SPARK_GRAFT_BENCH_OUT"] = ""  # merged below, never clobber
        # A hung/failed codec subprocess must never discard the main
        # suite's timings (ADVICE r12): record it as a family error.
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
                timeout=3600,
            )
        except (subprocess.TimeoutExpired, OSError) as exc:
            proc = None
            errors["__codec_family__"] = f"{type(exc).__name__}: {exc}"[:300]
        if proc is not None:
            sub = None
            for line in reversed(proc.stdout.splitlines()):
                if line.startswith("{"):
                    sub = json.loads(line)
                    break
            if sub is None:
                errors["__codec_family__"] = (
                    f"rc={proc.returncode}: {proc.stderr[-300:]}"
                )
            else:
                timings.update(sub.get("queries", {}))
                errors.update(sub.get("errors", {}))

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # Scaling-contract legibility (VERDICT r13 #3): prove the core
        # count was applied, not just read.
        "cpus": CPUS,
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    if errors:
        out["errors"] = errors
    # The driver truncates stdout (BENCH_r*.json keeps only a tail), so
    # persist the complete per-query map to a repo file on every full
    # run. Subset runs (SPARK_GRAFT_BENCH_ONLY) never clobber it.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "")
    if not out_path and not only:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
