"""The verification driver builds its OWN SparkSession (Spark 4
defaults: ANSI on, no nanos handling, machine TZ). The engine must work
there — Catalog pins the required confs at runtime. Runs in a
subprocess because the in-process JVM already carries test configs."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("vanilla").config("spark.ui.enabled", "false").getOrCreate())
assert spark.conf.get("spark.sql.ansi.enabled") == "true"  # genuine vanilla
import __spark_entry__ as E
assert E.entry(spark).count() > 0
qs = E.queries()
assert qs["zscore_anomaly"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["parse_delimited_roundtrip"](spark, "/root/testdata/sf0.001").count() > 0
print("VANILLA_OK")
"""


def test_engine_under_vanilla_driver_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "VANILLA_OK" in proc.stdout, proc.stdout + proc.stderr
