"""Streaming ANN serving (streaming/vector_serve.py): the foreachBatch
micro-batch server must (a) be EXACT when probing every cell, matching
a numpy brute-force oracle, (b) produce across streamed micro-batches
exactly the union of its per-batch results, and (c) actually prune to
the probed cells when nprobe < n_centroids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators.similarity import (
    train_ivf_codebook,
)
from climate_anomaly_bigdata_pipeline_spark.streaming import vector_serve as VS

SF = "/root/testdata/sf0.01"
N_CENTROIDS = 4


def _fixture(spark):
    emb = Catalog(spark, SF).embeddings
    cents = train_ivf_codebook(emb, N_CENTROIDS, 0)
    assigned = VS.assign_corpus_cells(emb, cents).localCheckpoint()
    qpdf = (
        emb.limit(8)
        .select("vec_id", "embedding")
        .toPandas()
        .rename(columns={"vec_id": "query_id", "embedding": "qvec"})
    )
    queries = spark.createDataFrame(qpdf)
    return cents, assigned, qpdf, queries


def _brute_topk(emb_pdf, qpdf, k):
    ids = emb_pdf["vec_id"].to_numpy()
    m = np.array([list(v) for v in emb_pdf["embedding"]], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    want = set()
    for _, qrow in qpdf.iterrows():
        qv = np.array(list(qrow["qvec"]), dtype=np.float64)
        cos = (m @ qv) / (norms * np.sqrt(qv @ qv))
        order = sorted(zip(-cos, ids))  # cosine desc, id asc
        for rank, (_, nid) in enumerate(order[:k], start=1):
            want.add((int(qrow["query_id"]), int(nid), rank))
    return want


def test_full_probe_serving_is_exact(spark):
    cents, assigned, qpdf, queries = _fixture(spark)
    out = VS.ann_serve_batch(
        queries, assigned, cents, k=5, nprobe=N_CENTROIDS
    )
    got = {(r.query_id, r.neighbor_id, r.rank) for r in out.collect()}
    emb_pdf = Catalog(spark, SF).embeddings.toPandas()
    assert got == _brute_topk(emb_pdf, qpdf, k=5)


def test_partial_probe_only_scores_probed_cells(spark):
    cents, assigned, qpdf, queries = _fixture(spark)
    out = VS.ann_serve_batch(queries, assigned, cents, k=5, nprobe=1)
    cell_of = {
        r[0]: r.cell
        for r in assigned.select(assigned.columns[0], "cell").collect()
    }
    home = {q: cell_of[q] for q in qpdf["query_id"]}
    for r in out.collect():
        # nprobe=1 probes exactly the query's home cell (the quantizer
        # is identical on both sides), so every neighbor shares it.
        assert cell_of[r.neighbor_id] == home[r.query_id]


def test_streamed_batches_union_batch_serving(spark, tmp_path):
    cents, assigned, qpdf, queries = _fixture(spark)
    src = tmp_path / "qstream"
    src.mkdir()
    halves = [qpdf.iloc[:4], qpdf.iloc[4:]]
    for i, half in enumerate(halves):
        pq.write_table(
            pa.table(
                {
                    "query_id": pa.array(half["query_id"], pa.int64()),
                    "qvec": pa.array(
                        [list(v) for v in half["qvec"]],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
            str(src / f"b{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("query_id long, qvec array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = str(tmp_path / "sink")
    q = VS.serve_ann_stream(
        stream,
        assigned,
        cents,
        sink_path=sink,
        checkpoint_path=str(tmp_path / "ckpt"),
        k=5,
        nprobe=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in VS.ann_serve_batch(
            queries, assigned, cents, k=5, nprobe=2
        ).collect()
    }
    assert got == want


def test_restart_with_checkpoint_does_not_reserve_processed_batches(
    spark, tmp_path
):
    """foreachBatch recovery contract: a restarted serving stream with
    the same checkpoint resumes AFTER the batches it already committed
    — the sink gains only the rows of files that arrived while it was
    down, never duplicates of served batches."""
    cents, assigned, qpdf, _ = _fixture(spark)
    src = tmp_path / "qstream"
    src.mkdir()

    def _write(name, part):
        pq.write_table(
            pa.table(
                {
                    "query_id": pa.array(part["query_id"], pa.int64()),
                    "qvec": pa.array(
                        [list(v) for v in part["qvec"]],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
            str(src / name),
        )

    _write("b0.parquet", qpdf.iloc[:4])
    stream_schema = "query_id long, qvec array<double>"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def _start():
        stream = (
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return VS.serve_ann_stream(
            stream, assigned, cents, sink_path=sink,
            checkpoint_path=ckpt, k=5, nprobe=2,
        )

    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(sink).count()

    # New queries land while the server is down; restart from the
    # same checkpoint.
    _write("b1.parquet", qpdf.iloc[4:])
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(sink).collect()
    served_twice = [
        r for r in rows if r.query_id in set(qpdf.iloc[:4]["query_id"])
    ]
    # batch-0 queries appear exactly once (5 neighbors each), batch-1
    # queries were served on restart.
    assert len(served_twice) == first == 4 * 5
    assert len(rows) == 8 * 5
