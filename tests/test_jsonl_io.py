"""JSONL source/sink roundtrip (sources/io.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.sources import io as IO

DOCS_META_SCHEMA = "doc_id bigint, lang string, source string, n_chars bigint"


def test_jsonl_roundtrip_preserves_rows_and_schema(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "docs_jsonl")
    IO.write_jsonl(docs, path)
    back = IO.read_jsonl(spark, path, schema=DOCS_META_SCHEMA)
    assert back.schema.simpleString() == docs.schema.simpleString()
    assert back.count() == docs.count()
    # Value-exact roundtrip
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_jsonl_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_by_lang")
    IO.write_jsonl(docs, path, partition_by=["lang"])
    back = IO.read_jsonl(spark, path, schema="doc_id bigint, n_chars bigint")
    one_lang = docs.select("lang").distinct().first()["lang"]
    pruned = spark.read.schema("doc_id bigint, n_chars bigint").json(
        f"{path}/lang={one_lang}"
    )
    expected = docs.filter(F.col("lang") == one_lang).count()
    assert pruned.count() == expected
    assert back.count() == docs.count()


def test_jsonl_permissive_nulls_malformed_lines(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "n_chars": 10}\n'
        "not json at all {\n"
        '{"doc_id": 2, "n_chars": 20}\n'
    )
    back = IO.read_jsonl(spark, str(p), schema="doc_id bigint, n_chars bigint")
    ok = back.where(F.col("doc_id").isNotNull())
    assert ok.count() == 2
    assert back.count() == 3  # malformed line -> all-null row, not a crash
