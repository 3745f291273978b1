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


def test_synthgen_stream_matches_batch(spark, tmp_path):
    """Streaming read over the same keyspace must produce exactly the
    batch dataset (same pure (seed, i) row function), arriving across
    multiple offset-bounded micro-batches."""
    synthgen.register(spark)
    stream = (
        spark.readStream.format("synthgen")
        .option("n_rows", 5_000)
        .option("rows_per_batch", 1_000)
        .option("num_partitions", 4)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM synth_stream")
    want = _read(spark, n_rows=5_000, num_partitions=4)
    assert got.count() == 5_000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
