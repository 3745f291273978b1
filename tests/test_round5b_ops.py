"""Round-5 additions: SemDeDup semantic pruning and the BPE-ish token
profile — oracle parity, semantic properties, and the no-cross-join
plan gate."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM
from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
from tests.oracle_utils import run_check


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", ["semdedup_prune_embeddings", "bpe_token_profile"])
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"


def _toy_corpus(spark):
    """Three exact-duplicate trios in well-separated directions, plus a
    singleton; a 2-centroid codebook that splits them."""
    rows = []
    for i in range(3):  # ids 0,1,2 ~ (1, 0)
        rows.append((i, [1.0, 0.0]))
    for i in range(3, 6):  # ids 3,4,5 ~ (0, 1)
        rows.append((i, [0.0, 1.0]))
    rows.append((6, [-1.0, 0.05]))  # singleton, nearer (1,0)'s negative
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semdedup_keeps_lowest_id_per_group(spark):
    df = _toy_corpus(spark)
    codebook = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = SIM.semdedup_prune(df, codebook, threshold=0.99)
    kept = {r.vec_id for r in out.filter("kept").collect()}
    # one representative per duplicate trio (the lowest id), singleton kept
    assert kept == {0, 3, 6}
    assert out.count() == 7  # decision row for every input


def test_semdedup_respects_cluster_boundary(spark):
    """Near-dups in DIFFERENT cells are not pruned — the published
    algorithm's recall tradeoff, asserted so a refactor can't silently
    turn this into an all-pairs dedup."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.001]), (1, [1.0, -0.001])],
        "vec_id bigint, embedding array<double>",
    )
    # adversarial codebook that splits the two near-identical vectors
    codebook = [(0, [1.0, 1.0]), (1, [1.0, -1.0])]
    out = SIM.semdedup_prune(df, codebook, threshold=0.9)
    assert out.filter("kept").count() == 2


def test_semdedup_plan_has_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["semdedup_prune_embeddings"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_tokens_known_values(spark):
    df = spark.createDataFrame(
        [(1, "don't stop"), (2, "a1b2"), (3, "  hi  there "), (4, "...")],
        "doc_id bigint, text string",
    )
    n_bpe = F.size(
        F.regexp_extract_all(
            "text",
            F.lit(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"),
            F.lit(0),
        )
    )
    got = {r.doc_id: r.n for r in df.select("doc_id", n_bpe.alias("n")).collect()}
    # don|'t|[ stop] = 3; a|1|b|2 = 4; hi|there = 2; ... = 1
    assert got == {1: 3, 2: 4, 3: 2, 4: 1}


def test_dsir_oracle(spark, sf_dir):
    ok, msg = run_check(spark, "dsir_importance_weights", sf_dir)
    assert ok, msg


def test_dsir_target_docs_score_higher(spark, sf_dir):
    """The defining property of importance weighting: documents drawn
    from the target slice ('en') must average a higher log importance
    than the rest of the corpus."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    w = QUERIES["dsir_importance_weights"](spark, sf_dir)
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "lang")
    per_lang = (
        w.join(docs, "doc_id")
        .withColumn("is_en", F.col("lang") == "en")
        .groupBy("is_en")
        .agg(F.avg(F.col("log_importance") / F.col("n_tokens")).alias("m"))
        .collect()
    )
    m = {r.is_en: r.m for r in per_lang}
    assert m[True] > m[False]


def test_bm25_oracle(spark, sf_dir):
    ok, msg = run_check(spark, "bm25_topk_docs", sf_dir)
    assert ok, msg


def test_bm25_known_corpus(spark):
    """Tiny hand-checkable corpus: the doc where the query term is a
    larger fraction of a shorter doc outranks a longer doc with equal
    term count; docs without the term never appear."""
    from climate_anomaly_bigdata_pipeline_spark.queries.textops import (
        _BM25_TERMS,
    )

    assert "join" in _BM25_TERMS
    docs = spark.createDataFrame(
        [
            (1, "join filter"),                      # tf=1, dl=2
            (2, "join filter filter filter filter"), # tf=1, dl=5
            (3, "filter scan"),                      # no query terms
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
        .replace(", lang string, source string, n_chars bigint", ""),
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        # route through the query by writing a minimal sf dir
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = QUERIES["bm25_topk_docs"](spark, d).collect()
    ids = [r.doc_id for r in out]
    assert ids == [1, 2]  # shorter doc first, term-free doc absent
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[1] > scores[2] > 0


def test_gemm_neardup_matches_brute_bitexact(spark):
    """BLAS candidate generation + exact refilter must reproduce the
    brute-force pair set AND cosine bits exactly (margin >> float64
    GEMM-vs-fold divergence)."""
    import random

    from climate_anomaly_bigdata_pipeline_spark.operators import dedup as DD

    rnd = random.Random(7)
    rows = []
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(40)]
    vid = 0
    for v in base:
        for _ in range(3):  # three 1%-noise copies of each base vector
            rows.append((vid, [x + rnd.gauss(0, 0.01) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    brute = DD.embedding_neardup_pairs(df, threshold=0.98)
    gemm = DD.embedding_neardup_pairs_gemm(df, threshold=0.98, chunk_rows=16)
    sb = {(r.id1, r.id2, r.cosine) for r in brute.collect()}
    sg = {(r.id1, r.id2, r.cosine) for r in gemm.collect()}
    assert sb == sg
    assert len(sb) > 0  # the check must not pass vacuously


def test_knn_exact_equals_brute(spark, sf_dir):
    """knn_join_exact (GEMM candidates + exact rescore) must equal the
    brute join row-for-row: ids, ranks, and cosine bits."""
    b = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in QUERIES["knn_join_brute"](spark, sf_dir).collect()
    }
    g = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in QUERIES["knn_join_exact"](spark, sf_dir).collect()
    }
    assert b == g and len(b) > 0


def test_hybrid_rrf_oracle(spark, sf_dir):
    ok, msg = run_check(spark, "hybrid_rrf_retrieval", sf_dir)
    assert ok, msg


def test_hybrid_rrf_fuses_both_lists(spark, sf_dir):
    """A doc ranked by both legs must outscore a doc ranked by one leg
    at equal single-list rank, and every fused score must be positive
    and bounded by 2/61."""
    rows = QUERIES["hybrid_rrf_retrieval"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.rrf > 0.0 and r.rrf <= 2.0 / 61.0 + 1e-12
        assert r.r_bm25 is not None or r.r_dense is not None
