"""Cross-session ANN artifact store (VERDICT r5 item 4): trained IVF /
PQ codebooks persist as Parquet and later sessions reload them with
ZERO training jobs — proven by monkeypatching the trainers to explode
on the reload path."""

from __future__ import annotations

import os

import pytest

from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM
from climate_anomaly_bigdata_pipeline_spark.queries import similarityq as SQ
from climate_anomaly_bigdata_pipeline_spark.sources import artifacts as ART

SF = "/root/testdata/sf0.001"


@pytest.fixture
def fresh_store(tmp_path, monkeypatch):
    """Empty artifact dir + cleared process memos, restored after."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    saved_ivf, saved_pq = dict(SQ._CODEBOOKS), dict(SQ._PQ_BOOKS)
    SQ._CODEBOOKS.clear()
    SQ._PQ_BOOKS.clear()
    yield str(tmp_path)
    SQ._CODEBOOKS.clear()
    SQ._PQ_BOOKS.clear()
    SQ._CODEBOOKS.update(saved_ivf)
    SQ._PQ_BOOKS.update(saved_pq)


def test_ivf_artifact_roundtrip(tmp_path):
    book = [(3, [0.5, -1.25, 2.0]), (7, [1.0, 0.0, -0.0625])]
    path = str(tmp_path / "ivf.parquet")
    ART.save_ivf(book, path)
    assert ART.load_ivf(path) == book


def test_pq_artifact_roundtrip(tmp_path):
    books = [
        (0, [(0, [0.5, 1.5]), (1, [-2.0, 0.25])]),
        (1, [(0, [3.0, -1.0]), (1, [0.125, 8.0])]),
    ]
    path = str(tmp_path / "pq.parquet")
    ART.save_pq(books, path)
    assert ART.load_pq(path) == books


def test_missing_artifact_loads_none(tmp_path):
    assert ART.load_ivf(str(tmp_path / "nope.parquet")) is None
    assert ART.load_pq(str(tmp_path / "nope.parquet")) is None


def test_second_session_reloads_ivf_without_training(
    spark, fresh_store, monkeypatch
):
    trained = SQ._ivf_codebook(spark, SF)  # session 1: trains + persists
    assert os.listdir(fresh_store)

    # "Session 2": fresh memo; training is forbidden.
    SQ._CODEBOOKS.clear()

    def boom(*a, **k):
        raise AssertionError("reload path must not train")

    monkeypatch.setattr(SIM, "train_ivf_codebook", boom)
    reloaded = SQ._ivf_codebook(spark, SF)
    assert reloaded == trained


def test_second_session_reloads_pq_without_training(
    spark, fresh_store, monkeypatch
):
    trained = SQ._pq_books(spark, SF)
    SQ._PQ_BOOKS.clear()

    def boom(*a, **k):
        raise AssertionError("reload path must not train")

    monkeypatch.setattr(SIM, "train_pq_codebooks", boom)
    reloaded = SQ._pq_books(spark, SF)
    assert reloaded == trained


def test_corpus_fingerprint_binds_artifact_to_data(tmp_path):
    """A regenerated corpus (different embeddings size/mtime) must key
    to a different artifact path — stale codebooks are never served."""
    d1, d2 = tmp_path / "sfA", tmp_path / "sfB"
    for d, payload in ((d1, b"x" * 10), (d2, b"y" * 20)):
        d.mkdir()
        (d / "embeddings.parquet").write_bytes(payload)
    p1 = ART.ivf_path(str(d1), 16, 2, 4)
    p2 = ART.ivf_path(str(d2), 16, 2, 4)
    assert p1 != p2
    # Same corpus, different hyperparameters → different artifact.
    assert ART.ivf_path(str(d1), 16, 2, 4) != ART.ivf_path(str(d1), 8, 2, 4)
