"""Named-dataset catalog over directories of Parquet tables.

The reference hard-codes an HDFS path convention per Medallion layer
(``jobs/common.py:11-19``). This generalizes that into a tiny catalog:
a directory of ``<table>.parquet`` datasets loadable as DataFrames and
registrable as temp views, so every operator addresses tables by name
rather than by path.

Scans stay ``spark.read.parquet`` so Catalyst gets column pruning and
predicate pushdown for free (reference behavior per SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver testdata provides (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Session confs the engine's semantics depend on. All are
#: runtime-settable, so they can be pinned even on a session the
#: engine didn't build (e.g. the verification driver's):
#: - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), unreadable by
#:   Spark 4 otherwise;
#: - ansi off: the reference's cast-to-null parse semantics (Spark 3.5
#:   default) — under ANSI a malformed token would throw, not null;
#: - UTC: date/time bucketing must match the UTC-naive oracle.
REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # Testdata timestamps are parquet TIMESTAMP(MICROS, isAdjustedToUTC=
    # false); Spark 4 infers TIMESTAMP_NTZ for those by default, which
    # breaks epoch extraction (unix_micros rejects NTZ). Read them as
    # plain TIMESTAMP — identical wall-clock under the UTC session zone,
    # matching the oracle's naive-timestamp semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


class Catalog:
    """Lazy loader for the parquet tables under one scale-factor dir.

    Works on any SparkSession: required semantic confs are pinned here
    (the single choke point every query goes through), so the engine
    behaves identically under a driver-provided session.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        ensure_session_confs(spark)
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            df = self.spark.read.parquet(self.path(name))
            self._cache[name] = self._normalize(name, df)
        return self._cache[name]

    @staticmethod
    def _normalize(name: str, df: DataFrame) -> DataFrame:
        """Repair columns Spark cannot represent natively.

        ``events.ts`` is parquet TIMESTAMP(NANOS); with
        ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long.
        Truncate (not round) to microseconds — DuckDB's TIMESTAMP_NS →
        TIMESTAMP cast truncates too, keeping oracle parity. Integer
        ``div`` avoids double-precision loss on 1e18-scale epochs.
        """
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Belt-and-braces for sessions where inferTimestampNTZ could not
        # be pinned before the scan: NTZ -> TIMESTAMP is wall-clock
        # preserving under the UTC session zone pinned above.
        ntz = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.TimestampNTZType)
        ]
        for c in ntz:
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, tables: tuple[str, ...] = TABLES) -> None:
        """Expose each table as a temp view for the SQL front-end."""
        for name in tables:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)
