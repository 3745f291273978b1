"""Product quantization (operators/similarity.py PQ section): oracle
parity at smoke scale, the zero-shuffle serving plan, and the
recall-ordering contract (rescore >= raw ADC against the cosine
ground truth)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
from tests.oracle_utils import run_check

PQ = [
    "pq_train_codebooks",
    "pq_code_histogram",
    "pq_ann_topk",
    "pq_rescore_topk",
]


def node_names(df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [m.split()[0] for m in re.findall(r"^\(\d+\) (.+)$", buf.getvalue(), re.M)]


@pytest.mark.parametrize("name", PQ)
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = run_check(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_adc_serving_never_shuffles(spark, sf_dir):
    """ADC scoring is code-lookup + fold per row: the corpus must not
    shuffle — scan, row-local projections, TakeOrdered, nothing else."""
    nodes = node_names(QUERIES["pq_ann_topk"](spark, sf_dir))
    assert "Exchange" not in nodes
    assert "TakeOrderedAndProject" in nodes


def test_code_histogram_single_exchange(spark, sf_dir):
    """Encode is row-local; the m·k-group count is the only exchange."""
    nodes = node_names(QUERIES["pq_code_histogram"](spark, sf_dir))
    assert nodes.count("Exchange") == 1


def test_codebook_shape_and_code_domain(spark, sf_dir):
    rows = QUERIES["pq_train_codebooks"](spark, sf_dir).collect()
    # 4 subspaces x 16 codes x 16 dims
    assert len(rows) == 4 * 16 * 16
    assert {r.sub for r in rows} == set(range(4))
    assert {r.code for r in rows} == set(range(16))


def test_rescore_recall_at_least_raw_adc(spark, sf_dir):
    """The exact-rescore stage can only help: its top-10 overlap with
    the brute cosine top-10 must be >= the raw ADC ranking's."""
    brute = {r.neighbor_id for r in QUERIES["cosine_topk"](spark, sf_dir).collect()}
    adc = {r.neighbor_id for r in QUERIES["pq_ann_topk"](spark, sf_dir).collect()}
    rescored = {
        r.neighbor_id for r in QUERIES["pq_rescore_topk"](spark, sf_dir).collect()
    }
    assert len(brute & rescored) >= len(brute & adc)
    assert len(brute & rescored) >= 3  # sanity floor at smoke scale


def test_ivfpq_oracle_parity(spark, sf_dir):
    ok, msg = run_check(spark, "ivfpq_ann_topk", sf_dir)
    assert ok, msg


def test_ivfpq_serving_never_shuffles(spark, sf_dir):
    """Cell filter + code lookup + fold are all row-local: no Exchange
    in the serving plan, TakeOrdered for the top-k."""
    nodes = node_names(QUERIES["ivfpq_ann_topk"](spark, sf_dir))
    assert "Exchange" not in nodes
    assert "TakeOrderedAndProject" in nodes
