"""Watermark late-data semantics (VERDICT r5 item 7): a watermarked
streaming window aggregation fed out-of-order micro-batches must KEEP
late rows whose window is still open and DROP rows older than the
watermark — and the kept set must match the batch aggregation of
exactly the non-dropped events.

Timeline (watermark delay = 1 hour, tumbling 1-hour windows, append
mode — a window emits once the watermark passes its end). Note Spark's
two-watermark contract (SPARK-24588): late-event FILTERING uses the
previous micro-batch's watermark, EVICTION/emission the current one —
so a too-late row is dropped once it arrives ≥2 batches after the
event that advanced the watermark past its window.

  batch 0: 10:00, 10:15, 12:00     → watermark advances to 11:00
  batch 1: 11:30 (late arrival, window [11:00,12:00) still open →
           KEPT), 13:00            → watermark advances to 12:00
  batch 2: 09:30 (window [09:00,10:00) long closed → DROPPED),
           14:00                   → watermark advances to 13:00

Emitted: {10:00: 2, 11:00: 1, 12:00: 1}; 09:30 appears nowhere; the
state operator reports exactly one watermark-dropped row. Windows
[13:00) / [14:00) are still open when the bounded stream drains —
append mode holds them in state, which is the documented contract."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_batch(path: str, times: list[dt.datetime]) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(times)), pa.int64()),
                "ts": pa.array(times, pa.timestamp("us")),
            }
        ),
        path,
    )


def _t(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m)


def test_watermark_keeps_open_window_lates_and_drops_closed(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    batches = [
        ("b1.parquet", [_t(10, 0), _t(10, 15), _t(12, 0)]),
        ("b2.parquet", [_t(11, 30), _t(13, 0)]),
        ("b3.parquet", [_t(9, 30), _t(14, 0)]),
    ]
    for i, (name, times) in enumerate(batches):
        p = str(src / name)
        _write_batch(p, times)
        # File source picks oldest-mtime first; force batch order.
        os.utime(p, (1_000_000 * (i + 1), 1_000_000 * (i + 1)))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_lates")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    got = {
        r["window_start"]: r["n"]
        for r in spark.sql("SELECT * FROM wm_lates").collect()
    }
    # Late-but-open 11:30 counted; too-late 09:30 absent everywhere.
    assert got == {_t(10): 2, _t(11): 1, _t(12): 1}
    assert dropped == 1, f"expected exactly the 09:30 row dropped, got {dropped}"

    # Batch parity on the contract: aggregating every event EXCEPT the
    # watermark-dropped one reproduces the emitted windows exactly
    # (restricted to windows the final 13:00 watermark finalized).
    batch = (
        spark.read.parquet(str(src))
        .where(F.col("ts") != F.lit(_t(9, 30)))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    want = {
        r["window_start"]: r["n"]
        for r in batch.collect()
        if r["window_start"] < _t(13)
    }
    assert got == want
