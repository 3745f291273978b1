"""Custom Python DataSource (sources/synthgen.py): parallel planning,
determinism, and schema contract."""

from __future__ import annotations

from climate_anomaly_bigdata_pipeline_spark.sources import synthgen


def _read(spark, **opts):
    synthgen.register(spark)
    r = spark.read.format("synthgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthgen_rows_schema_partitions(spark):
    df = _read(spark, n_rows=10_000, num_partitions=4)
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double>"
    )
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 4
    assert df.select("event_id").distinct().count() == 10_000


def test_synthgen_deterministic_across_partitioning(spark):
    """Row i is a pure function of (seed, i): re-planning with a
    different partition count must not change a single value."""
    a = _read(spark, n_rows=5_000, num_partitions=3).orderBy("event_id").collect()
    b = _read(spark, n_rows=5_000, num_partitions=11).orderBy("event_id").collect()
    assert a == b


def test_synthgen_seed_changes_data(spark):
    a = _read(spark, n_rows=100, seed=1).orderBy("event_id").collect()
    b = _read(spark, n_rows=100, seed=2).orderBy("event_id").collect()
    assert a != b


def test_synthgen_uneven_tail_partition(spark):
    df = _read(spark, n_rows=1001, num_partitions=4)
    assert df.count() == 1001
