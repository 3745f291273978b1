"""Custom Python DataSource: partitioned deterministic event generator.

The Spark-4-native re-expression of the reference's synthetic-fallback
path (``reference/jobs/00_download_data.py`` writes a CSV with a Python
loop on the driver): instead of materializing a file, register a
*proper* Spark DataSource whose planning step splits the keyspace into
``numPartitions`` independent ranges — each executor generates its
slice in parallel from a per-row md5-derived seed, so the same
(n_rows, seed) always yields the same dataset with zero storage and no
driver bottleneck. This is how you feed a 1000-executor scale test
100 TB of synthetic input: generation parallelism == cluster cores,
no object store in the loop.

Registered per-session via :func:`register`; then::

    spark.read.format("synthgen").option("n_rows", 1e6).load()

Determinism contract: row ``i`` is a pure function of (seed, i) via
md5 — no RNG state, no partition-order dependence; repartitioning the
generator never changes values (same recipe as the engine's
deterministic samplers, operators/dedup.py:md5_hash32).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EVENT_TYPES = ("view", "click", "purchase", "refund")
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


def _u64(*parts: object) -> int:
    """Deterministic 64-bit stream from md5 over the joined parts."""
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:16], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(float(options.get("n_rows", 1000)))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.n_users = int(options.get("n_users", 100))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.num_partitions)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows), self.seed)
            for i in range(self.num_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import datetime

        base = datetime.datetime(2024, 1, 1)
        for i in range(partition.start, partition.end):
            r = _u64(partition.seed, i)
            yield (
                i,
                base + datetime.timedelta(seconds=(r >> 16) % (30 * 86400)),
                r % self.n_users,
                _EVENT_TYPES[(r >> 8) % len(_EVENT_TYPES)],
                round(((r >> 24) % 100000) / 100.0, 2),
            )


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synthgen")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthgen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def streamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Register the source on this session (idempotent)."""
    spark.dataSource.register(SynthEventsDataSource)


# ---- streaming variant (DataSourceStreamReader) -----------------------------


class SynthEventsStreamReader(DataSourceStreamReader):
    """Offset-managed streaming twin of :class:`SynthEventsReader`.

    Offsets are row counts: each micro-batch covers rows
    [start.row, end.row) where ``latestOffset`` advances by
    ``rows_per_batch`` until ``n_rows`` is exhausted. The planner
    splits every batch range into ``num_partitions`` sub-ranges, so
    batch generation is as parallel as the batch is wide. Row values
    are the SAME pure (seed, i) function as the batch reader: a
    streaming run and a batch run over the same keyspace produce
    identical datasets — which is what makes backfill-vs-live parity
    testable for pipelines fed by this source. ``commit`` is a no-op
    (nothing to clean up; Spark's own checkpoint holds progress)."""

    def __init__(self, options: dict):
        self._r = SynthEventsReader(options)
        self.rows_per_batch = int(float(options.get("rows_per_batch", 1000)))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # Bounded stream: advance one batch at a time up to n_rows.
        # (An unbounded generator would just keep advancing.)
        # Progress is clamped to the last offset Spark has handed back
        # (via partitions/commit): a reader re-created from a checkpoint
        # starts with _latest=0 and would otherwise return an offset
        # BELOW the committed start, stalling the stream with empty or
        # regressive batches.
        floor = max(getattr(self, "_latest", 0), getattr(self, "_committed", 0))
        self._latest = min(floor + self.rows_per_batch, self._r.n_rows)
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["row"], end["row"]
        # Spark replays the checkpointed start here on restart — treat it
        # as a committed floor so latestOffset never regresses below it.
        self._committed = max(getattr(self, "_committed", 0), lo)
        if hi <= lo:
            return [_RangePartition(lo, lo, self._r.seed)]
        per = -(-(hi - lo) // self._r.num_partitions)
        return [
            _RangePartition(lo + i * per, min(lo + (i + 1) * per, hi), self._r.seed)
            for i in range(self._r.num_partitions)
            if lo + i * per < hi
        ]

    def read(self, partition: _RangePartition):
        return self._r.read(partition)

    def commit(self, end: dict) -> None:
        pass
