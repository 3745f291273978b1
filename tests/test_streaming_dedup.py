"""Incremental exact dedup (transformWithStateInPandas) vs the batch
``dedup_first_event`` row: after the stream drains, last-emit-per-key
must be BIT-IDENTICAL to the batch result — the contract that lets a
pipeline swap the nightly dedup job for the continuous one.

Runs in a subprocess for the same reasons as
tests/test_stateful_v2_worker.py: the worker protobuf bridge must be
on PYTHONPATH before the JVM launches, and the RocksDB state-store
provider conf is session-wide.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from climate_anomaly_bigdata_pipeline_spark.compat import pbshim

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from climate_anomaly_bigdata_pipeline_spark.compat import pbshim
how = pbshim.install()
assert how is not None, "no protobuf runtime"

from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[4]")
    .appName("v2-dedup-parity")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
from climate_anomaly_bigdata_pipeline_spark.streaming import windows as SW
from climate_anomaly_bigdata_pipeline_spark.streaming.stateful_v2 import (
    streaming_exact_dedup_v2,
)

sf_dir = "/root/testdata/sf0.001"
stream = SW.read_events_stream(spark, sf_dir)
out = streaming_exact_dedup_v2(stream)
q = (
    out.writeStream.outputMode("update")
    .format("memory")
    .queryName("v2_dedup")
    .start()
)
try:
    q.processAllAvailable()
finally:
    q.stop()

# update-mode memory sink: each key's LAST emitted row is the final
# state (the bounded source may process in >1 micro-batch; rows land
# in emit order per key, so take the one with the max n_dups —
# n_dups is monotone in processed rows).
rows = spark.sql("SELECT * FROM v2_dedup").collect()
got = {}
for r in rows:
    k = (r["user_id"], r["event_type"])
    if k not in got or r["n_dups"] >= got[k]["n_dups"]:
        got[k] = r

want = {
    (r["user_id"], r["event_type"]): r
    for r in QUERIES["dedup_first_event"](spark, sf_dir).collect()
}
# duplicate counts from the batch side
ev = Catalog(spark, sf_dir).events
counts = {
    (r["user_id"], r["event_type"]): r["n"]
    for r in ev.groupBy("user_id", "event_type")
    .agg(F.count(F.lit(1)).alias("n"))
    .collect()
}
assert set(got) == set(want), (len(got), len(want))
for k, w in want.items():
    g = got[k]
    assert g["event_id"] == w["event_id"], (k, g, w)
    assert g["value"] == w["value"], (k, g, w)
    assert g["n_dups"] == counts[k] - 1, (k, g["n_dups"], counts[k])
print("V2_DEDUP_PARITY_OK keys=%d runtime=%s" % (len(got), how))
"""


def test_streaming_dedup_matches_batch_first_event():
    if pbshim.install() is None:
        pytest.skip("no google.protobuf runtime available on this host")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/repo/tools/pbshim_site"
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert "V2_DEDUP_PARITY_OK" in proc.stdout, (
        proc.stdout[-3000:] + proc.stderr[-3000:]
    )
