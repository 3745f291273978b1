"""Round-11 regression tests — storage-layout hardening (ADVICE r10).

The bucketed-layout register path must never serve files written under
a DIFFERENT spec (bucket count / schema / key): an exchange-free
SortMergeJoin over wrongly-bucketed files silently misjoins rows. The
marker written after each build pins the spec; these tests drive the
three repair paths: torn write (no _SUCCESS), missing marker, and
marker/spec mismatch.
"""

import json
import os

import pytest


def _toy(spark):
    return spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(20)], "k bigint, v double"
    )


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "bkt")


def _ensure(spark, table, loc, buckets=4):
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        _ensure_bucketed,
    )

    _ensure_bucketed(
        spark,
        table,
        loc,
        "k BIGINT, v DOUBLE",
        "k",
        lambda: _toy(spark),
        buckets,
    )


def test_bucketed_build_writes_marker(spark, loc):
    _ensure(spark, "r11_bkt_a", loc)
    assert os.path.exists(loc + ".json")
    spec = json.load(open(loc + ".json"))
    assert spec == {"buckets": 4, "schema": "k BIGINT, v DOUBLE", "key": "k"}
    assert spark.table("r11_bkt_a").count() == 20


def test_bucketed_torn_write_rebuilds(spark, loc):
    """Files present but _SUCCESS missing (a write that died mid-flight)
    must rebuild with overwrite, not error and not register."""
    _ensure(spark, "r11_bkt_b1", loc)
    os.remove(os.path.join(loc, "_SUCCESS"))
    _ensure(spark, "r11_bkt_b2", loc)  # fresh name → takes the repair path
    assert spark.table("r11_bkt_b2").count() == 20
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))


def test_bucketed_marker_mismatch_rebuilds(spark, loc):
    """A marker recording a different bucket count than requested must
    NOT be registered as-is — the files get rewritten under the new
    spec and the marker updated."""
    _ensure(spark, "r11_bkt_c1", loc, buckets=4)
    _ensure(spark, "r11_bkt_c2", loc, buckets=2)
    assert json.load(open(loc + ".json"))["buckets"] == 2
    assert spark.table("r11_bkt_c2").count() == 20


def test_partitioned_fact_marker_pins_layout_spec(spark, sf_dir):
    """The fact marker stores the writer spec (version/columns/
    partition), and a mismatching marker forces a rewrite."""
    from climate_anomaly_bigdata_pipeline_spark.queries import storageq as SQ

    path = SQ.ensure_partitioned_fact(spark, sf_dir)
    marker = os.path.join(os.path.dirname(path), "li_by_year.json")
    spec = json.load(open(marker))
    assert spec["version"] == SQ._FACT_LAYOUT_VERSION
    assert spec["columns"] == SQ._FACT_COLS
    # stale-writer simulation: bump the recorded version → must rewrite
    json.dump({**spec, "version": -1}, open(marker, "w"))
    before = os.path.getmtime(marker)
    SQ.ensure_partitioned_fact(spark, sf_dir)
    assert json.load(open(marker)) == spec
    assert os.path.getmtime(marker) >= before


def test_corpus_sig_missing_source_raises(spark, tmp_path):
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        _corpus_sig,
    )

    with pytest.raises(OSError):
        _corpus_sig(str(tmp_path), "nope")
