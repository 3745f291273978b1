"""REAL-worker parity for the v2 stateful API.

``transformWithStateInPandas`` runs ``UserProfileProcessor`` inside an
actual Python worker talking to the JVM state server — not against the
in-memory fakes of tests/test_stateful_v2.py. The worker needs a
``google.protobuf`` runtime, bridged by compat/pbshim.py; the test
SKIPS (visibly) only when no runtime can be found at all.

Runs in a subprocess because (a) the worker environment (PYTHONPATH →
sitecustomize hook) must be set before the JVM launches, and (b) the
RocksDB state-store provider conf is session-wide.
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
    .appName("v2-worker-parity")
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
from climate_anomaly_bigdata_pipeline_spark.streaming import windows as SW
from climate_anomaly_bigdata_pipeline_spark.streaming.stateful_v2 import (
    running_user_profiles_v2,
)

sf_dir = "/root/testdata/sf0.001"
stream = SW.read_events_stream(spark, sf_dir)
out = running_user_profiles_v2(stream)
q = (
    out.writeStream.outputMode("update")
    .format("memory")
    .queryName("v2_profiles")
    .start()
)
try:
    q.processAllAvailable()
finally:
    q.stop()

# update-mode memory sink: keep each user's LAST emitted profile (the
# bounded source may process in >1 micro-batch).
got = {
    r["user_id"]: r
    for r in spark.sql("SELECT * FROM v2_profiles").collect()
}

ev = Catalog(spark, sf_dir).events
want = {
    r["user_id"]: r
    for r in ev.groupBy("user_id")
    .agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.countDistinct("event_type").alias("n_distinct_types"),
    )
    .collect()
}
assert set(got) == set(want), (len(got), len(want))
for uid, w in want.items():
    g = got[uid]
    assert g["n_events"] == w["n_events"], uid
    assert g["n_distinct_types"] == w["n_distinct_types"], uid
    assert abs(g["total_value"] - w["total_value"]) < 1e-6, uid
print("V2_WORKER_PARITY_OK users=%d runtime=%s" % (len(got), how))
"""


def test_transform_with_state_real_worker_parity():
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
    assert "V2_WORKER_PARITY_OK" in proc.stdout, (
        proc.stdout[-3000:] + proc.stderr[-3000:]
    )
