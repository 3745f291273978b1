"""Guard against driver testdata drift.

The driver regenerates /root/testdata between rounds and its physical
layout has already changed once (events.ts: TIMESTAMP(NANOS) ->
TIMESTAMP(MICROS) NTZ, which silently broke every unix_micros-based
query under Spark 4's NTZ inference). The Catalog's contract is that
whatever the parquet layout, every table surfaces with these canonical
logical types — if the generator changes again, this test names the
drift instead of letting 40 queries fail with type errors.
"""

from __future__ import annotations

import pytest

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

CANONICAL = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": (
        "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>"
    ),
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp>"
    ),
    "events": (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"
    ),
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("table", sorted(CANONICAL))
def test_catalog_surfaces_canonical_schema(spark, sf_dir, table):
    got = getattr(Catalog(spark, sf_dir), table).schema.simpleString()
    assert got == CANONICAL[table], (
        f"testdata drift on '{table}': catalog surfaced {got}, queries "
        f"assume {CANONICAL[table]} — update Catalog._normalize to repair "
        "the new physical layout back to the canonical schema."
    )


def test_events_ts_supports_epoch_math(spark, sf_dir):
    """unix_micros is the epoch primitive under sessionize / range join /
    as-of; it rejects TIMESTAMP_NTZ, so ts must surface as TIMESTAMP."""
    from pyspark.sql import functions as F

    ev = Catalog(spark, sf_dir).events
    row = ev.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] > 0
