"""Round-8 operators: exact maximal repeat spans (arbitrary length)."""

from __future__ import annotations

import itertools

from climate_anomaly_bigdata_pipeline_spark.operators import dedup as DD
from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

# Collision-free filler: a digit stream where every 40-gram occurs at
# exactly one position (it spans ≥6 consecutive 6-digit numbers, which
# pin it), remapped per call onto a DISJOINT 10-char alphabet so that
# grams straddling a filler/block junction can never match across two
# different fillers either (single-char runs self-repeat and raw digit
# slices share "00…" junctions — both break exact-boundary asserts).
_M = "".join(f"{i:06d}" for i in range(200))
_ctr = itertools.count()


def _uniq(n: int) -> str:
    k = next(_ctr)
    assert n <= len(_M)
    return "".join(chr(0x100 + 10 * k + int(c)) for c in _M[:n])


def _spans(spark, rows, min_len=40):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DD.maximal_repeat_spans(df, min_len=min_len)
    return sorted(
        (r["doc_id"], r["span_start"], r["span_len"], r["n_dup_grams"])
        for r in out.collect()
    )


def test_single_cross_doc_repeat_exact_boundaries(spark):
    # a 60-char shared block embedded at different offsets; the filler
    # is collision-free, so the span must be exactly the block.
    block = "X" * 60
    a = _uniq(50) + block + _uniq(30)
    b = _uniq(20) + block + _uniq(70)
    got = _spans(spark, [(1, a), (2, b)])
    # span covers exactly the 60 shared chars: 60-40+1=21 dup grams
    assert got == [(1, 50, 60, 21), (2, 20, 60, 21)]


def test_repeat_shorter_than_min_len_not_reported(spark):
    block = "Y" * 39  # one char short of the threshold
    a = _uniq(50) + block + _uniq(30)
    b = _uniq(50) + block + _uniq(30)
    assert _spans(spark, [(1, a), (2, b)]) == []


def test_within_document_repeat_detected(spark):
    block = "Z" * 45
    text = _uniq(10) + block + _uniq(25) + block + _uniq(10)
    got = _spans(spark, [(7, text)])
    # two islands: pure-Z grams at 10..15 and 80..85; the 65-position
    # gap exceeds 40, so the blocks stay separate maximal spans.
    assert got == [(7, 10, 45, 6), (7, 80, 45, 6)]


def test_touching_blocks_merge_into_one_span(spark):
    # the same 40-char block back-to-back: one contiguous 80-char span.
    block = "W" * 40
    a = _uniq(5) + block + block + _uniq(5)
    b = _uniq(9) + block + _uniq(41)
    got = _spans(spark, [(1, a), (2, b)])
    assert got == [(1, 5, 80, 41), (2, 9, 40, 1)]


def test_spans_consistent_with_strided_profile(spark, sf_oracle_dir):
    """Any document with a strided dup window must own ≥1 span (the
    strided profile detects a subset of what the exact spans cover)."""
    from climate_anomaly_bigdata_pipeline_spark.queries.dedupq import (
        _doc_corpus,
    )

    corpus = _doc_corpus(spark, sf_oracle_dir)
    strided = {
        r["doc_id"]
        for r in DD.substring_dup_stats(corpus, window=40, stride=10)
        .filter("n_dup_windows > 0")
        .collect()
    }
    span_docs = {
        r["doc_id"]
        for r in QUERIES["maximal_repeat_spans"](spark, sf_oracle_dir)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert strided <= span_docs
