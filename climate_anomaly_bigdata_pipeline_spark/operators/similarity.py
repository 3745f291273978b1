"""Similarity search over embedding columns (SURVEY §2.10).

* :func:`cosine_topk` — brute-force cosine top-k against a query
  vector: the correctness baseline. One broadcast of the query row, a
  pure-expression fold per candidate, TakeOrdered for the top-k — no
  shuffle of the embedding table at all.
* :func:`with_lsh_bucket` + :func:`lsh_bucket_topk` — the scale path:
  sign-of-random-projection LSH. Hyperplane weights are ±1 vectors
  derived from md5 in *Python* (deterministic, engine-independent) and
  embedded as literals, so an external oracle can reproduce bucketing
  bit-for-bit. Candidates are restricted to the query's bucket —
  at 100 TB this turns a full-corpus scan into one bucket's partition
  (bucket by this key on write for partition pruning), trading recall
  for a ~2^planes fan-in reduction; increase recall with multi-probe
  (visit buckets at Hamming distance 1) or several independent tables.

The in-row dot product (``zip_with`` + sequential ``aggregate`` fold)
is bit-identical to DuckDB's ``list_dot_product`` (verified), keeping
cosine scores oracle-checkable without rounding.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators.dedup import cosine_expr, dot_expr

__all__ = [
    "hyperplane_weights",
    "cosine_topk",
    "with_lsh_bucket",
    "lsh_bucket_topk",
    "ivf_topk",
    "knn_join",
    "knn_join_gemm",
    "ivf_knn_join",
    "train_ivf_codebook",
    "train_pq_codebooks",
    "pq_code_histogram",
    "pq_adc_topk",
    "pq_rescore_topk",
    "semdedup_prune",
    "dot_expr",
    "cosine_expr",
]


def hyperplane_weights(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1.0 hyperplane weights from md5(seed:plane:dim).

    Computed driver-side with hashlib — no engine hash involved — so the
    same literals can be pasted into any oracle SQL.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _dlit(x: float) -> str:
    """Shortest round-trip double literal for Spark SQL — ``repr`` of a
    Python float parses back to the bit-identical IEEE double (verified
    incl. -0.0 and denormals). Finite-only by contract (codebooks and
    plane weights)."""
    import math

    x = float(x)
    if not math.isfinite(x):  # pragma: no cover - upstream bug guard
        raise ValueError(f"non-finite literal: {x!r}")
    return repr(x) + "D"


def _lit_vec(weights: list[float]) -> Column:
    # One ArrayType literal built by PARSING a SQL string JVM-side:
    # a single py4j call. Both element-wise F.lit+F.array AND container
    # F.lit pay ~0.7 ms of py4j per element (measured: 2 s for a
    # 44x64 codebook either way; the parsed form is ~0.02-0.1 s), and
    # the single Literal node additionally keeps Catalyst's per-action
    # optimization walk off a ~1000-node tree.
    if not weights:
        # array() types as array<void> and fails dot folds cryptically
        # at resolution time (ADVICE r13) — fail fast instead.
        raise ValueError("empty vector literal")
    return F.expr("array(" + ",".join(_dlit(w) for w in weights) + ")")


def _lit_mat(vecs: list[list[float]]) -> Column:
    """Nested array<array<double>> literal via one parsed SQL string —
    same bit-exactness contract as :func:`_lit_vec`."""
    if not vecs or any(not v for v in vecs):
        raise ValueError("empty matrix literal")  # ADVICE r13 fail-fast
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(x) for x in v) + ")" for v in vecs
        )
        + ")"
    )


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit h set iff dot(vec, plane_h) > 0."""
    out = None
    for h, w in enumerate(planes):
        bit = F.when(dot_expr(vec, _lit_vec(w)) > 0, F.lit(1 << h)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    n_planes: int = 4,
    out: str = "bucket",
) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    dim = len(df.select(vec_col).first()[0])
    planes = planes or hyperplane_weights(n_planes, dim)
    return df.withColumn(out, bucket_expr(v, planes))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k nearest neighbors (cosine) of one corpus vector."""
    # Norms hoisted out of the per-pair expression (the folds are
    # interpreted, so one fold per candidate instead of three).
    e = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))
    q = e.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        e.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            dot_expr(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm")),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)


def lsh_bucket_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    n_planes: int = 4,
) -> DataFrame:
    """IVF/LSH-style ANN: score only vectors in the query's bucket.

    Same output shape as :func:`cosine_topk`; recall < 1 by design —
    the oracle checks the bucketing + scoring logic, the quality
    trade-off is the operator's documented contract.
    """
    bucketed = with_lsh_bucket(df, vec_col, planes, n_planes)
    e = bucketed.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"), "bucket"
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))
    q = e.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        e.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .withColumn(
            "cosine",
            dot_expr(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm")),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"), "bucket", "cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)


def knn_join(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch KNN join (brute baseline): top-k cosine neighbors for EVERY
    vector matching ``query_pred``, against the whole corpus.

    The query side is broadcast (it must be the bounded side — a query
    batch, not the corpus), so the corpus never shuffles: each task
    scores its corpus slice against all queries and the per-query top-k
    is a row_number over a window partitioned by query id. O(|Q|·|N|)
    scoring — the correctness baseline; :func:`ivf_knn_join` is the
    celled scale path when the query side is the corpus itself.
    """
    from pyspark.sql import Window

    e = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))
    q = e.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                dot_expr(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    # Project BEFORE the ranking window: the top-k shuffle moves
    # (query_id, neighbor_id, cosine) triples, never the vectors.
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_assignment(
    e: DataFrame,
    codebook: list[tuple[int, list[float]]],
    topn: int = 1,
) -> DataFrame:
    """Coarse-quantize a :func:`_normed` corpus against ``codebook``:
    one localCheckpointed scan emitting ``__cells`` (ALL candidate
    cells as (cosine, cid) structs sorted desc — element 0 is the home
    cell, the first n are the exact top-n probe set for any n ≤ the
    candidate depth) plus the ``cell`` home-cell column.

    Candidates come from the GEMM pass (superset of the exact top-n by
    the margin contract), then the exact fold rescoring + sort makes
    the probe list bit-identical to evaluating every centroid
    (:func:`with_cell_candidates` docstring). The checkpoint matters
    twice over: the corpus branch and the probe branch of
    :func:`ivf_knn_join` both read it, and a tuning sweep shares ONE
    assignment across all its nprobe settings."""
    return (
        with_cell_candidates(e, codebook, topn=max(topn, 1))
        .withColumn(
            "__cells", F.reverse(F.array_sort(_cand_cell_structs(codebook)))
        )
        .withColumn("cell", F.col("__cells")[0].getField("i"))
        .drop("__cand")
        .localCheckpoint()
    )




def ivf_knn_candidates(
    assigned: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-rescored IVF KNN candidates tagged with the PROBE RANK of
    the cell each neighbor came from — the shared pass a tuning sweep
    runs ONCE at its deepest nprobe. For any p ≤ ``nprobe``, filtering
    ``probe_rank <= p`` and taking the per-query top-k by
    (cosine desc, neighbor_id) is bit-identical to
    :func:`ivf_knn_join` at nprobe = p over the same ``assigned``:
    a corpus vector is a candidate via exactly ONE cell (its home
    cell), the per-cell margin rule keeps a superset of every query's
    in-cell top-k independently of which other queries share the task,
    and the rescore is the same sequential fold. So the sweep pays ONE
    in-cell GEMM pass instead of one per setting (at sf10 that is the
    difference between 3x32 s and 32 s of scoring).

    Same task shape as :func:`ivf_knn_join`: whole-cell corpus blobs x
    2048-query chunks, float64 GEMM per task, margin-superset then
    exact fold rescoring.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    qchunk_rows = 2048
    queries = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.posexplode(
            F.transform(
                F.slice(F.col("__cells"), 1, nprobe),
                lambda s: s.getField("i"),
            )
        ).alias("pr0", "cell"),
    ).select(
        "query_id", "qv", "cell", (F.col("pr0") + 1).cast("int").alias("pr")
    )
    cblob = (
        assigned.select(F.col(id_col).alias("nid"), "v", "cell")
        .groupBy("cell")
        .agg(F.collect_list(F.struct("nid", "v")).alias("cb"))
    )
    wq = Window.partitionBy("cell").orderBy("query_id")
    qblob = (
        queries.withColumn(
            "qc", F.floor((F.row_number().over(wq) - 1) / F.lit(qchunk_rows))
        )
        .groupBy("cell", "qc")
        .agg(F.collect_list(F.struct("query_id", "pr", "qv")).alias("qb"))
    )
    tasks = cblob.join(qblob, "cell").repartition(F.col("cell"), F.col("qc"))
    kk = int(k)
    mg = 1e-6

    def score(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ci = np.fromiter((r["nid"] for r in row["cb"]), dtype=np.int64)
                cm = np.array([r["v"] for r in row["cb"]], dtype=np.float64)
                qi = np.fromiter(
                    (r["query_id"] for r in row["qb"]), dtype=np.int64
                )
                qpr = np.fromiter((r["pr"] for r in row["qb"]), dtype=np.int32)
                qm = np.array([r["qv"] for r in row["qb"]], dtype=np.float64)
                cn = np.sqrt((cm * cm).sum(axis=1))
                qn = np.sqrt((qm * qm).sum(axis=1))
                cs = (cm @ qm.T) / np.outer(cn, qn)
                self_mask = ci[:, None] == qi[None, :]
                cs[self_mask] = -np.inf
                take = min(kk, cs.shape[0])
                kth = (
                    np.partition(cs, -take, axis=0)[-take, :]
                    if cs.shape[0] > take
                    else cs.min(axis=0)
                )
                keep = (cs >= (kth[None, :] - mg)) & ~self_mask
                i, j = np.nonzero(keep)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qi[j],
                            "probe_rank": qpr[j],
                            "neighbor_id": ci[i],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    cands = tasks.mapInPandas(
        score, "query_id long, probe_rank int, neighbor_id long"
    )
    qv = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    nv = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    return (
        cands.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "probe_rank",
            (
                dot_expr(F.col("nv"), F.col("qv"))
                / (F.col("nnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )


def ivf_knn_join(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    train_sample_mod: int | None = None,
    codebook: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Self-KNN over the whole corpus, IVF-celled — the scale path for
    "top-k neighbors of every document" (embedding dedup, retrieval
    index build).

    Every vector is coarse-quantized to its nearest cell (row-local
    expression, deterministic seed codebook as in :func:`ivf_topk`);
    the query side additionally probes its ``nprobe`` best cells.
    Neighbor candidates are then a plain **equi-join on the cell id** —
    at 100 TB that is a co-partitioned join (cell = partition key on
    write), so the quadratic all-pairs explosion becomes
    Σ_cells |probe(cell)|·|cell| ≈ nprobe/n_centroids of it, and no
    task ever sees more than one cell's candidates. Recall < 1 by
    design (documented ANN trade-off); ranking ties break by
    (cosine desc, neighbor id). ``train_iters`` Lloyd iterations refine
    the codebook before assignment (:func:`train_ivf_codebook`) —
    trained cells track the data's clusters, so the same nprobe buys
    strictly better recall.

    ``assigned``: a precomputed :func:`ivf_assignment` output whose
    ``topn`` was ≥ ``nprobe``. Tuning sweeps (recall-vs-nprobe) pass
    the SAME assignment to every setting — the assignment scan is
    nprobe-independent (the exact rescoring sorts ALL candidate
    cells, so slicing the first ``nprobe`` of a deeper probe list is
    bit-identical to assigning at ``topn=nprobe``), and re-deriving it
    per setting just re-reads the corpus (VERDICT r11 #4).
    """
    from pyspark.sql import Window

    if assigned is None:
        # One materialization of (id, v, norm) shared by training
        # passes and serving — the norm fold over the corpus isn't
        # recomputed per Lloyd iteration.
        e = _normed(df, id_col, vec_col).localCheckpoint()

        # Offline-codebook serving path, same contract as :func:`ivf_topk`.
        cents = codebook if codebook is not None else train_ivf_codebook(
            df, n_centroids, train_iters, id_col=id_col, vec_col=vec_col,
            sample_mod=train_sample_mod, normed=e,
        )
        assigned = ivf_assignment(e, cents, topn=nprobe)
    # In-cell scoring is one float64 GEMM per cell (the knn_join_gemm
    # recipe): corpus and probe blobs are grouped by cell executor-side,
    # each cell task emits every corpus row within margin of a probing
    # query's k-th best cell score — a guaranteed superset of that
    # query's exact top-k within the cell — and candidates are
    # re-scored with the exact fold + ranked exactly, so the result is
    # bit-identical to per-pair fold scoring of the probed cells
    # (38 s -> ~4 s at sf1). At 100 TB, cells are the partition key on
    # write and one cell-pair task maps to one co-partitioned split;
    # grow n_centroids with the corpus so |cell| stays task-sized.
    import numpy as np
    import pandas as pd

    # The PROBE side is chunked (per-cell row_number -> fixed-size
    # query batches); the corpus side stays one whole-cell blob per
    # task. One whole-cell×whole-probe task goes quadratic in task
    # memory and serializes the stage onto n_centroids tasks as |cell|
    # grows (measured at sf10, 200k vecs / 16 cells: 1373 s with
    # 12.5k × 25k = 2.5 GB cosine blocks on 12 live tasks). Chunking
    # the CORPUS side instead is a trap: the margin rule keeps ≥k rows
    # per query PER CORPUS CHUNK, so candidates multiply by the chunk
    # count — measured at sf10 it spilled the rescore sort to disk
    # exhaustion. Query-side chunks keep candidates at O(queries × k)
    # while bounding the GEMM block to |cell| × qchunk; the per-query
    # k-th-best margin rule still sees the whole cell, so the exact
    # rescore + exact window below reproduce the whole-cell result
    # bit-for-bit. |cell| itself is bounded by the documented contract
    # (grow n_centroids with the corpus so a cell stays task-sized).
    qchunk_rows = 2048
    queries = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.transform(F.slice(F.col("__cells"), 1, nprobe), lambda s: s.getField("i"))
        ).alias("cell"),
    )
    cblob = (
        assigned.select(F.col(id_col).alias("nid"), "v", "cell")
        .groupBy("cell")
        .agg(F.collect_list(F.struct("nid", "v")).alias("cb"))
    )
    wq = Window.partitionBy("cell").orderBy("query_id")
    qblob = (
        queries.withColumn(
            "qc", F.floor((F.row_number().over(wq) - 1) / F.lit(qchunk_rows))
        )
        .groupBy("cell", "qc")
        .agg(F.collect_list(F.struct("query_id", "qv")).alias("qb"))
    )
    tasks = cblob.join(qblob, "cell").repartition(F.col("cell"), F.col("qc"))
    kk = int(k)
    mg = 1e-6

    def score(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ci = np.fromiter((r["nid"] for r in row["cb"]), dtype=np.int64)
                cm = np.array([r["v"] for r in row["cb"]], dtype=np.float64)
                qi = np.fromiter((r["query_id"] for r in row["qb"]), dtype=np.int64)
                qm = np.array([r["qv"] for r in row["qb"]], dtype=np.float64)
                cn = np.sqrt((cm * cm).sum(axis=1))
                qn = np.sqrt((qm * qm).sum(axis=1))
                cs = (cm @ qm.T) / np.outer(cn, qn)
                self_mask = ci[:, None] == qi[None, :]
                cs[self_mask] = -np.inf
                take = min(kk, cs.shape[0])
                kth = (
                    np.partition(cs, -take, axis=0)[-take, :]
                    if cs.shape[0] > take
                    else cs.min(axis=0)
                )
                keep = (cs >= (kth[None, :] - mg)) & ~self_mask
                i, j = np.nonzero(keep)
                outs.append(
                    pd.DataFrame({"query_id": qi[j], "neighbor_id": ci[i]})
                )
            if outs:
                yield pd.concat(outs)

    cands = tasks.mapInPandas(score, "query_id long, neighbor_id long")
    qv = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    nv = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    scored = (
        cands.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_expr(F.col("nv"), F.col("qv")) / (F.col("nnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    # Vectors are dropped before the ranking window (see knn_join).
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _cell_assign_structs(cents: list[tuple[int, list[float]]]) -> Column:
    """(cosine, cid) structs per centroid against columns ``v``/``norm``;
    ``array_max`` over them is the coarse-quantizer assignment (ties
    break toward the larger cid — struct comparison is (c, i)).

    Built as ONE ``transform`` over an index sequence against three
    array literals (codebook matrix, centroid norms, cell ids) instead
    of a per-centroid comprehension: expression CONSTRUCTION is O(1)
    py4j/lambda builds rather than O(n_centroids). With the corpus-
    derived codebook size (n_centroids ~ sqrt(N), 141 cells at sf1)
    the comprehension form spent ~10 s of driver time per build — and
    a serving query builds this expression several times — while
    executor-side evaluation of 20k rows is under half a second. The
    per-element IEEE ops are identical to the old form (same
    ``dot_expr`` fold, then one divide by norm·cnorm with the centroid
    norm precomputed driver-side), so assignments stay bit-identical
    to the oracle's per-pair cosine CTEs."""
    import math

    cids = [int(cid) for cid, _ in cents]
    vecs = [[float(x) for x in cv] for _, cv in cents]
    norms = [math.sqrt(_py_dot(cv, cv)) for cv in vecs]
    cb = _lit_mat(vecs)  # one parsed nested-array literal node
    cn = _lit_vec(norms)
    ci = F.expr("array(" + ",".join(f"{c}L" for c in cids) + ")")
    idx = F.sequence(F.lit(1), F.lit(len(cents)))
    return F.transform(
        idx,
        lambda i: F.struct(
            (
                dot_expr(F.col("v"), F.element_at(cb, i))
                / (F.col("norm") * F.element_at(cn, i))
            ).alias("c"),
            F.element_at(ci, i).cast("long").alias("i"),
        ),
    )


def _normed(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))


def with_cell_candidates(
    e: DataFrame,
    cents: list[tuple[int, list[float]]],
    topn: int = 1,
    margin: float = 1e-9,
    out: str = "__cand",
) -> DataFrame:
    """Append ``out`` = the 1-based codebook indices of every cell whose
    float64-GEMM cosine to ``v`` is within ``margin`` of the row's
    ``topn``-th best — a guaranteed superset of the exact top-``topn``
    cells under the fold cosine (BLAS and the sequential fold agree to
    ~1e-13 on unit-scale cosines, so a 1e-9 margin absorbs the
    summation-order drift; exact ties land inside the margin and are
    resolved downstream by the exact rescore in
    :func:`_cand_cell_structs`). This is the GEMM-candidates +
    exact-fold-rescore shape the in-cell scoring already uses, applied
    to the coarse-quantizer assignment itself: with the corpus-derived
    codebook (n_centroids ~ sqrt(N), 447 cells at sf10) the per-row
    interpreted fold over EVERY centroid became the dominant cost
    (~2e10 lambda steps), while one numpy GEMM per Arrow batch is
    seconds. Input must carry ``v``/``norm`` (see :func:`_normed`).
    Deliberately NO repartition: the serving plans' no-Exchange
    contract holds (cell assignment stays row-local), and the GEMM is
    cheap enough that even an under-split local scan finishes in
    fractions of a second per partition."""
    import numpy as np
    from pyspark.sql import types as T

    C = np.array([cv for _, cv in cents], dtype=np.float64)
    Cn = np.sqrt((C * C).sum(axis=1))
    nt = min(int(topn), len(cents))
    kth_pos = len(cents) - nt
    out_schema = T.StructType(
        list(e.schema.fields)
        + [T.StructField(out, T.ArrayType(T.IntegerType()))]
    )

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf[out] = []
                yield pdf
                continue
            V = np.stack(pdf["v"].to_numpy())
            cos = (V @ C.T) / np.outer(pdf["norm"].to_numpy(), Cn)
            kth = np.partition(cos, kth_pos, axis=1)[:, kth_pos]
            mask = cos >= (kth - margin)[:, None]
            pdf[out] = [
                (np.nonzero(m)[0] + 1).astype("int32") for m in mask
            ]
            yield pdf

    return e.mapInPandas(gen, schema=out_schema)


def _cand_cell_structs(
    cents: list[tuple[int, list[float]]], cand_col: str = "__cand"
) -> Column:
    """Exact (cosine, cid) structs over the candidate indices produced
    by :func:`with_cell_candidates` — the same IEEE ops as
    :func:`_cell_assign_structs` (dot fold, divide by norm·cnorm with
    the centroid norm precomputed driver-side), evaluated only on the
    O(topn) candidates per row, so ``array_max`` / sorted-prefix over
    them is bit-identical to evaluating every centroid."""
    import math

    cids = [int(cid) for cid, _ in cents]
    vecs = [[float(x) for x in cv] for _, cv in cents]
    norms = [math.sqrt(_py_dot(cv, cv)) for cv in vecs]
    # Parsed-SQL literals, not container F.lit: the py4j element
    # transfer cost ~0.7 ms/element — ~1-2 s of DRIVER time per build
    # for a 22-44 cell codebook, paid by every IVF serving query on
    # every bench pass (r14; the r13 fix covered _cell_assign_structs
    # but missed this twin). Values round-trip bit-exactly via repr.
    cb = _lit_mat(vecs)
    cn = _lit_vec(norms)
    ci = F.expr("array(" + ",".join(f"{c}L" for c in cids) + ")")
    return F.transform(
        F.col(cand_col),
        lambda i: F.struct(
            (
                dot_expr(F.col("v"), F.element_at(cb, i))
                / (F.col("norm") * F.element_at(cn, i))
            ).alias("c"),
            F.element_at(ci, i).cast("long").alias("i"),
        ),
    )


def assign_cells(
    e: DataFrame,
    cents: list[tuple[int, list[float]]],
    out: str = "cell",
) -> DataFrame:
    """Exact coarse-quantizer assignment (max-cosine cell, ties to the
    larger cid) via GEMM candidates + exact rescore — the scalable
    replacement for ``array_max(_cell_assign_structs(...))`` over the
    whole codebook."""
    return (
        with_cell_candidates(e, cents, topn=1)
        .withColumn(out, F.array_max(_cand_cell_structs(cents)).getField("i"))
        .drop("__cand")
    )


# 2^53: exact power-of-two scaling for engine-portable fixed-point
# sums (see train_ivf_codebook's determinism contract).
FIXED_POINT_SCALE = 9007199254740992.0


def train_ivf_codebook(
    df: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    normed: DataFrame | None = None,
) -> list[tuple[int, list[float]]]:
    """Coarse-quantizer codebook for the IVF operators: the
    ``n_centroids`` lowest-id vectors as seeds, refined by ``n_iters``
    deterministic Lloyd iterations (k-means with cosine assignment and
    arithmetic-mean update). Returns ``[(cell_id, centroid_vector)]``
    with cell ids fixed to the seed vectors' ids across iterations.

    Determinism contract (what keeps an external oracle in lockstep):

    * assignment ties break toward the larger cell id — the same
      ``(cosine, cid)`` struct-max used at serving time;
    * per-cell per-dimension means go through FIXED-POINT sums:
      each component is scaled by 2^53 (an exact power-of-two multiply
      — no rounding) into an integer, summed as DECIMAL(38,0) (exact,
      order-independent, ~10^22 rows of headroom per group), then
      unscaled in double. Every step is either exact or
      correctly-rounded IEEE, so the refined centroids are
      bit-identical in any engine that follows the same recipe
      (mirrored in ``queries/similarityq.py``'s iteration CTEs).
      Fractional-decimal sums (DECIMAL(25,10) casts of the raw
      doubles) are NOT engine-portable: a float32 component with
      exactly 11 decimal fraction digits (e.g. 561/2048) sits
      precisely on the rounding tie, where Spark casts HALF_UP and
      DuckDB doesn't — observed once per ~100k vectors. The 2^53
      scaling is exact for any |x| >= 2^-29, i.e. every non-degenerate
      float32 embedding component;
    * a cell that captures no vectors keeps its previous centroid.

    Each iteration is one training-set pass: row-local assignment
    against codebook literals (no shuffle), posexplode, one
    (cell, pos)-keyed aggregation — the
    :func:`embedding_centroids_by_label` shape — and a bounded
    O(n_centroids x dim) driver collect (the coordinator-side quantizer
    update of a real IVF build). The corpus itself never shuffles.
    ``sample_mod`` trains on the deterministic ``id % sample_mod == 0``
    subset — the 100 TB posture (the update needs a representative
    sample, not the corpus) AND still oracle-mirrorable as a WHERE
    clause. ``normed`` lets callers share one checkpointed
    (id, v, norm) projection between training and serving."""
    e = _normed(df, id_col, vec_col) if normed is None else normed

    cents = [
        (r[0], list(r[1]))
        for r in e.select(id_col, "v").orderBy(id_col).limit(n_centroids).collect()
    ]
    train = e if sample_mod is None else e.filter(F.col(id_col) % sample_mod == 0)
    for _ in range(n_iters):
        assigned = assign_cells(train, cents)
        means = (
            assigned.select("cell", F.posexplode("v"))
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum(
                        (F.col("col") * F.lit(FIXED_POINT_SCALE)).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    / F.lit(FIXED_POINT_SCALE)
                    / F.count(F.lit(1)).cast("double")
                ).alias("m")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = [
            (
                cid,
                [by_cell[cid][p] for p in range(len(old))] if cid in by_cell else old,
            )
            for cid, old in cents
        ]
    return cents


def _py_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot product — the same IEEE operation order
    as :func:`dot_expr` and DuckDB's list_dot_product, so driver-side
    codebook math is bit-identical to engine-side math."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    train_sample_mod: int | None = None,
    codebook: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: coarse-quantize the corpus into
    ``n_centroids`` cells, probe only the ``nprobe`` cells nearest the
    query, brute-force cosine within them.

    The codebook is the ``n_centroids`` lowest-id vectors, refined by
    ``train_iters`` deterministic Lloyd iterations
    (:func:`train_ivf_codebook` — 0 keeps the raw seed codebook; the
    *serving* plan is identical either way). Codebook + query vector
    are collected driver-side (a bounded O(n_centroids x dim) read —
    the coordinator-side "quantizer" of a real IVF index) and embedded
    as literals, so cell assignment is a row-local expression: the
    corpus never shuffles, the scan prunes to ``nprobe/n_centroids`` of
    the data once cells are a partition key on write. Ties in cell
    assignment break toward the larger centroid id; final ranking by
    (cosine desc, id asc).
    """
    import math

    e = _normed(df, id_col, vec_col).localCheckpoint()

    # ``codebook`` serves from an offline-trained quantizer — at 100 TB
    # nobody trains per query; the codebook is a persisted artifact
    # (see queries/similarityq.py's per-corpus cache and the
    # ``ivf_train_codebook`` query that oracle-checks the recipe).
    cents = codebook if codebook is not None else train_ivf_codebook(
        df, n_centroids, train_iters, id_col=id_col, vec_col=vec_col,
        sample_mod=train_sample_mod, normed=e,
    )
    qrow = e.filter(F.col(id_col) == query_id).select("v").first()
    qv = list(qrow[0])
    qnorm = math.sqrt(_py_dot(qv, qv))

    # Cell assignment: GEMM candidates + exact (cosine, cid) struct-max
    # rescore — bit-identical to evaluating every centroid.
    assigned = assign_cells(e, cents)

    # Driver-side probe selection (same float ops as the engine).
    scored_cells = sorted(
        (
            (_py_dot(qv, cv) / (math.sqrt(_py_dot(cv, cv)) * qnorm), cid)
            for cid, cv in cents
        ),
        key=lambda t: (-t[0], -t[1]),
    )
    probed = [cid for _, cid in scored_cells[:nprobe]]

    scored = (
        assigned.filter(F.col("cell").isin(probed) & (F.col(id_col) != query_id))
        .withColumn(
            "cosine",
            dot_expr(F.col("v"), _lit_vec(qv)) / (F.col("norm") * F.lit(qnorm)),
        )
        .select(
            F.lit(query_id).cast("long").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "cell",
            "cosine",
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)


def semdedup_prune(
    df: DataFrame,
    codebook: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public paper):
    coarse-cluster the corpus with a k-means codebook, then inside each
    cluster drop every vector whose cosine to a LOWER-id cluster-mate
    is >= ``threshold`` (the lowest id is the kept representative).

    Returns one row per input vector: ``(id, cell, kept)``.

    Why this shape at 100 TB: cluster assignment is row-local against
    broadcast codebook literals (zero shuffle of the corpus), and the
    candidate pairs are a plain equi-join on the cell id — the
    co-partitioned join shape, never an all-pairs cross join. Pair work
    is Sum_cells |cell|^2 instead of n^2; cells are bounded by the
    offline quantizer granularity (grow n_centroids with the corpus,
    and AQE skew-split handles hot cells). Cross-cluster near-dups are
    missed BY DESIGN — that is the published algorithm's recall
    tradeoff, which is what makes it tractable at scale.

    Determinism: assignment ties break toward the larger cid
    (struct-max, same rule as :func:`ivf_topk`); the drop rule keys on
    vector ids, so the kept set is unique regardless of join order.
    """
    e = assign_cells(_normed(df, id_col, vec_col), codebook)
    # In-cell pair evaluation is float64 GEMM (the
    # embedding_neardup_pairs_gemm recipe: executor-side blobs, margin
    # candidates, exact-fold refilter) — the within-cell equi-join with
    # per-pair interpreted folds was 63 s at sf1, the GEMM path 3-16 s,
    # and the final dup set is bit-identical because survivors are
    # re-verified with the exact expression.
    #
    # Cells are additionally CHUNKED (per-cell row_number -> fixed-size
    # batches) and paired upper-triangle (a.chunk <= b.chunk) inside
    # each cell: one whole-cell blob per task goes quadratic in task
    # memory and serializes the stage onto n_centroids tasks as |cell|
    # grows with the corpus — measured at sf10 (200k vecs, 16 cells):
    # whole-cell blobs 378 s (12 live tasks, 2.5 GB cosine blocks);
    # bounded chunk-pair GEMMs restore full-core parallelism. The pair
    # set is unchanged: chunking only partitions the in-cell upper
    # triangle (candidates are threshold-hits, not per-chunk top-k, so
    # chunking cannot multiply them). Rank-based chunks (not id-range):
    # a cell's ids are spread over the whole id domain, so id-range
    # chunking shatters cells into hundreds of tiny overhead-bound
    # tasks.
    from pyspark.sql import Window

    import numpy as np
    import pandas as pd

    thr_cand = float(threshold) - 1e-6
    chunk_rows = 4096
    wc = Window.partitionBy("cell").orderBy(id_col)
    ec = e.withColumn(
        "chunk", F.floor((F.row_number().over(wc) - 1) / F.lit(chunk_rows))
    )
    blobs = ec.groupBy("cell", "chunk").agg(
        F.collect_list(F.struct(id_col, "v")).alias("blob")
    )
    tasks = (
        blobs.select(
            "cell", F.col("chunk").alias("ca"), F.col("blob").alias("blob_a")
        )
        .join(
            blobs.select(
                "cell", F.col("chunk").alias("cb"), F.col("blob").alias("blob_b")
            ),
            "cell",
        )
        .filter(F.col("ca") <= F.col("cb"))
        .repartition(F.col("cell"), F.col("ca"), F.col("cb"))
    )

    def score(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ia = np.fromiter((r[id_col] for r in row["blob_a"]), dtype=np.int64)
                va = np.array([r["v"] for r in row["blob_a"]], dtype=np.float64)
                same = row["ca"] == row["cb"]
                if same:
                    ib, vb = ia, va
                else:
                    ib = np.fromiter(
                        (r[id_col] for r in row["blob_b"]), dtype=np.int64
                    )
                    vb = np.array([r["v"] for r in row["blob_b"]], dtype=np.float64)
                na = np.sqrt((va * va).sum(axis=1))
                nb = na if same else np.sqrt((vb * vb).sum(axis=1))
                cs = (va @ vb.T) / np.outer(na, nb)
                i, j = np.nonzero(cs >= thr_cand)
                keep = ia[i] < ib[j]  # strict order also kills the diagonal
                outs.append(
                    pd.DataFrame({"id1": ia[i][keep], "id2": ib[j][keep]})
                )
            if outs:
                yield pd.concat(outs)

    cands = tasks.mapInPandas(score, "id1 long, id2 long")
    v1 = e.select(
        F.col(id_col).alias("id1"), F.col("v").alias("v1"), F.col("norm").alias("n1")
    )
    v2 = e.select(
        F.col(id_col).alias("id2"), F.col("v").alias("v2"), F.col("norm").alias("n2")
    )
    dups = (
        cands.join(v1, "id1")
        .join(v2, "id2")
        .filter(
            dot_expr(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
            >= F.lit(threshold)
        )
        .select(F.col("id2").alias("dup_id"))
        .distinct()
    )
    return (
        e.join(dups, e[id_col] == dups.dup_id, "left")
        .select(
            F.col(id_col),
            "cell",
            F.col("dup_id").isNull().alias("kept"),
        )
    )


def knn_join_gemm(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 4096,
    margin: float = 1e-6,
) -> DataFrame:
    """EXACT batch KNN join (same result as :func:`knn_join`,
    bit-for-bit) with BLAS candidate generation: the corpus is chunked
    by id range; each chunk task computes one float64 GEMM of
    (chunk × query batch) cosines and emits, per query, every chunk row
    within ``margin`` of that query's k-th best chunk score — a
    guaranteed superset of the query's global top-k restricted to the
    chunk (margin >> GEMM-vs-fold float divergence). Candidates are
    re-scored with the exact sequential-fold expression and ranked with
    the exact (cosine DESC, neighbor_id) window, so ranks and cosine
    bits match the brute join.

    Per-query candidate volume is O(chunks × k), independent of corpus
    size; the corpus never shuffles (executor-side chunk blobs), and
    the expensive O(|Q|·N) scoring runs at GEMM speed instead of one
    interpreted fold per pair (~25x at sf1).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    e = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))
    q = e.filter(query_pred)
    qblob = q.groupBy(F.lit(1).alias("one")).agg(
        F.collect_list(F.struct("id", "v")).alias("qblob")
    )
    chunks = (
        e.withColumn("cid", F.floor(F.col("id") / F.lit(chunk_rows)))
        .groupBy("cid")
        .agg(F.collect_list(F.struct("id", "v")).alias("blob"))
    )
    tasks = chunks.crossJoin(F.broadcast(qblob)).repartition(F.col("cid"))
    kk = int(k)
    mg = float(margin)

    def score(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ci = np.fromiter((r["id"] for r in row["blob"]), dtype=np.int64)
                cm = np.array([r["v"] for r in row["blob"]], dtype=np.float64)
                qi = np.fromiter((r["id"] for r in row["qblob"]), dtype=np.int64)
                qm = np.array([r["v"] for r in row["qblob"]], dtype=np.float64)
                cn = np.sqrt((cm * cm).sum(axis=1))
                qn = np.sqrt((qm * qm).sum(axis=1))
                cs = (cm @ qm.T) / np.outer(cn, qn)  # chunk x queries
                # exclude self-pairs: mask rows where corpus id == query id
                self_mask = ci[:, None] == qi[None, :]
                cs[self_mask] = -np.inf
                take = min(kk, cs.shape[0])
                # k-th best score per query within this chunk
                kth = (
                    np.partition(cs, -take, axis=0)[-take, :]
                    if cs.shape[0] > take
                    else cs.min(axis=0)
                )
                keep = (cs >= (kth[None, :] - mg)) & ~self_mask
                i, j = np.nonzero(keep)
                outs.append(
                    pd.DataFrame({"query_id": qi[j], "neighbor_id": ci[i]})
                )
            if outs:
                yield pd.concat(outs)

    cands = tasks.mapInPandas(score, "query_id long, neighbor_id long")
    qv = q.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cv = e.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    rescored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_expr(F.col("nv"), F.col("qv"))
                / (F.col("nnorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---- product quantization (PQ) ---------------------------------------------
#
# The compression leg of the 100 TB ANN stack next to IVF's pruning
# leg: split each d-dim vector into ``m`` subspaces, learn a tiny
# per-subspace codebook, store each vector as ``m`` small codes
# (64 float32 dims -> 4 bytes here, a 64x footprint cut), and score
# queries against codes via an asymmetric-distance LUT without ever
# touching the original vectors (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", TPAMI 2011). Assignment and scoring
# use the INNER-PRODUCT metric (MIPS-PQ): no norms, so every step is
# a plain sequential-fold dot product that an external SQL oracle
# reproduces bit-for-bit.

PQCodebooks = list[tuple[int, list[tuple[int, list[float]]]]]


def train_pq_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    dim: int = 64,
) -> PQCodebooks:
    """Per-subspace PQ codebooks: ``[(sub, [(code, centroid_subvec)])]``
    with codes ``0..k-1`` per subspace.

    The same determinism contract as :func:`train_ivf_codebook`, per
    subspace: seeds are the ``k`` lowest-id vectors' subvectors (code =
    rank of the seed's id), assignment maximizes the sequential-fold
    DOT PRODUCT with ties toward the larger code, and centroid means
    use the exact 2^53 fixed-point DECIMAL(38,0) sum — so an oracle
    rerunning the recipe in SQL lands on bit-identical codebooks.
    Training is one bounded O(m·k·d_sub) driver collect per iteration
    over the deterministic ``id % sample_mod == 0`` sample; the corpus
    never shuffles (row-local assignment against codebook literals).
    """
    d_sub = dim // m
    e = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).localCheckpoint()
    train = e if sample_mod is None else e.filter(F.col(id_col) % sample_mod == 0)

    seed_rows = e.select(id_col, "v").orderBy(id_col).limit(k).collect()
    books: PQCodebooks = []
    for sub in range(m):
        lo = sub * d_sub
        cents = [
            (code, list(r["v"][lo : lo + d_sub]))
            for code, r in enumerate(seed_rows)
        ]
        sv = train.select(
            id_col, F.slice("v", lo + 1, d_sub).alias("sv")
        )
        for _ in range(n_iters):
            structs = F.array(
                *[
                    F.struct(
                        dot_expr(F.col("sv"), _lit_vec(cv)).alias("c"),
                        F.lit(code).cast("long").alias("i"),
                    )
                    for code, cv in cents
                ]
            )
            means = (
                sv.withColumn("code", F.array_max(structs).getField("i"))
                .select("code", F.posexplode("sv"))
                .groupBy("code", "pos")
                .agg(
                    (
                        F.sum(
                            (F.col("col") * F.lit(FIXED_POINT_SCALE)).cast(
                                "decimal(38,0)"
                            )
                        ).cast("double")
                        / F.lit(FIXED_POINT_SCALE)
                        / F.count(F.lit(1)).cast("double")
                    ).alias("m")
                )
                .collect()
            )
            by_code: dict[int, dict[int, float]] = {}
            for r in means:
                by_code.setdefault(r["code"], {})[r["pos"]] = r["m"]
            cents = [
                (
                    code,
                    [by_code[code][p] for p in range(d_sub)]
                    if code in by_code
                    else old,
                )
                for code, old in cents
            ]
        books.append((sub, cents))
    return books


def _pq_code_cols(books: PQCodebooks, d_sub: int) -> list[Column]:
    """Per-subspace code assignment columns over a vector column ``v``:
    row-local ``array_max`` over (dot, code) structs, ties toward the
    larger code — zero shuffle of the corpus.

    Built as ONE ``transform`` per subspace against two array literals
    (subspace codebook matrix, code ids) — the
    :func:`_cell_assign_structs` construction. The per-code
    comprehension built m×k ``dot_expr`` lambda trees through py4j
    (~20 ms each — measured 2.7-3.8 s of pure DRIVER time per build at
    m=8, k=16, paid by every PQ serving query, every bench pass);
    this form builds m lambdas (~0.3 s). Evaluation is unchanged:
    ``element_at`` yields the same literal vectors, the dot fold runs
    the same IEEE sequence, so codes are bit-identical."""
    cols = []
    for sub, cents in books:
        lo = sub * d_sub
        sv = F.slice("v", lo + 1, d_sub)
        codes = [int(code) for code, _ in cents]
        vecs = [[float(x) for x in cv] for _, cv in cents]
        cb = _lit_mat(vecs)  # one parsed nested-array literal node
        ci = F.lit(codes)
        idx = F.sequence(F.lit(1), F.lit(len(cents)))
        def _mk(sv, cb, ci):
            return lambda i: F.struct(
                dot_expr(sv, F.element_at(cb, i)).alias("c"),
                F.element_at(ci, i).cast("long").alias("i"),
            )

        structs = F.transform(idx, _mk(sv, cb, ci))
        cols.append(F.array_max(structs).getField("i").alias(f"code_{sub}"))
    return cols


def pq_code_histogram(
    df: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Corpus-wide PQ code distribution ``(sub, code, n_vectors)`` —
    the index-build health check (dead or overloaded codes are the PQ
    analogue of skewed partitions). Encoding is row-local against
    codebook literals; the only shuffle is the m·k-group count."""
    d_sub = dim // len(books)
    e = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    coded = e.select(*_pq_code_cols(books, d_sub))
    stacked = coded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sub).cast("int").alias("sub"),
                        F.col(f"code_{sub}").alias("code"),
                    )
                    for sub, _ in books
                ]
            )
        ).alias("sc")
    ).select("sc.sub", "sc.code")
    return stacked.groupBy("sub", "code").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def pq_adc_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    books: PQCodebooks | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k by inner product: encode the
    corpus row-locally, precompute the query's ``m × k`` dot-product
    lookup table driver-side (bounded — the real serving shape keeps
    codes, not vectors), and score each vector as the sub-ordered
    sequential sum of ``m`` LUT entries.

    Scale notes: after an offline encode the scan reads ``m`` byte-ish
    code columns instead of the d-dim float array — the memory-
    bandwidth win that makes PQ the standard billion-vector format;
    scoring is ``element_at`` into literal arrays + a 4-term ordered
    fold (pure codegen, no shuffle), and the top-k is a TakeOrdered.
    Exactness: LUT entries are driver-side ``_py_dot`` folds (identical
    IEEE sequence to the engine/oracle), and the final sum folds in
    fixed subspace order — bit-identical in any engine following the
    recipe.

    Finite-only contract (ADVICE r13): the query vector (and codebooks)
    must be finite — LUT values become SQL literals via ``_dlit``,
    which raises ``ValueError`` on NaN/Inf at plan-build time rather
    than propagating NaN distances."""
    assert books is not None
    d_sub = dim // len(books)
    e = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    qrow = e.filter(F.col(id_col) == query_id).select("v").first()
    qv = list(qrow[0])

    luts: dict[int, list[float]] = {}
    for sub, cents in books:
        q_sub = qv[sub * d_sub : (sub + 1) * d_sub]
        luts[sub] = [_py_dot(q_sub, cv) for _, cv in cents]

    coded = e.filter(F.col(id_col) != query_id).select(
        F.col(id_col).alias("neighbor_id"), *_pq_code_cols(books, d_sub)
    )
    terms = F.array(
        *[
            F.element_at(
                _lit_vec(luts[sub]),
                (F.col(f"code_{sub}") + 1).cast("int"),
            )
            for sub, _ in books
        ]
    )
    scored = coded.select(
        F.lit(query_id).cast("long").alias("query_id"),
        "neighbor_id",
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x).alias("adc_score"),
    )
    return scored.orderBy(F.col("adc_score").desc(), F.col("neighbor_id")).limit(k)


def pq_rescore_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    books: PQCodebooks | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Two-stage PQ serving — the standard production ANN path: ADC
    over codes shortlists ``shortlist`` candidates (cheap, code-only
    scan), then ONLY those candidates' original vectors are read for
    an exact cosine rescore of the final top-``k``.

    Scale notes: stage 1 touches codes only (the 64× smaller
    representation); stage 2 is a broadcast semi-join of a bounded
    candidate-id set against the vector store — at 100 TB that is
    ``shortlist`` point reads, not a scan. Recall is set by the
    shortlist width, exactness of the final scores by the rescore."""
    cand = pq_adc_topk(
        df, query_id, k=shortlist, books=books,
        id_col=id_col, vec_col=vec_col, dim=dim,
    ).select("neighbor_id")
    import math

    e = _normed(df, id_col, vec_col)
    qrow = e.filter(F.col(id_col) == query_id).select("v").first()
    qv = list(qrow[0])
    qnorm = math.sqrt(_py_dot(qv, qv))
    rescored = (
        e.join(F.broadcast(cand), e[id_col] == cand.neighbor_id, "left_semi")
        .withColumn(
            "cosine",
            dot_expr(F.col("v"), _lit_vec(qv)) / (F.col("norm") * F.lit(qnorm)),
        )
        .select(
            F.lit(query_id).cast("long").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "cosine",
        )
    )
    return rescored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
    ivf_codebook: list[tuple[int, list[float]]] | None = None,
    pq_books: PQCodebooks | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ ANN — the two offline artifacts composed, i.e. the FAISS
    default index shape: the coarse quantizer prunes WHICH vectors a
    query touches (nprobe cells), the product quantizer shrinks WHAT
    is read per vector (codes, not floats), and ADC scores the
    surviving codes. Both assignments are row-local expressions over
    broadcast codebook literals, so the corpus never shuffles; at
    100 TB cells are partition keys on write (scan prunes to
    nprobe/n_cells) and the pruned scan reads the 64×-smaller code
    columns. (FAISS additionally PQ-encodes residuals against the cell
    centroid for fidelity; this serves raw-vector codes to keep the
    recipe oracle-mirrorable — the documented deviation.)

    Finite-only contract (ADVICE r13): query vector and codebooks must
    be finite — LUT/centroid values become SQL literals via ``_dlit``,
    which raises ``ValueError`` on NaN/Inf at plan-build time."""
    import math

    assert ivf_codebook is not None and pq_books is not None
    e = _normed(df, id_col, vec_col)
    assigned = assign_cells(e, ivf_codebook)
    qrow = e.filter(F.col(id_col) == query_id).select("v").first()
    qv = list(qrow[0])
    qnorm = math.sqrt(_py_dot(qv, qv))
    scored_cells = sorted(
        (
            (_py_dot(qv, cv) / (math.sqrt(_py_dot(cv, cv)) * qnorm), cid)
            for cid, cv in ivf_codebook
        ),
        key=lambda t: (-t[0], -t[1]),
    )
    probed = [cid for _, cid in scored_cells[:nprobe]]

    d_sub = dim // len(pq_books)
    luts: dict[int, list[float]] = {}
    for sub, cents in pq_books:
        q_sub = qv[sub * d_sub : (sub + 1) * d_sub]
        luts[sub] = [_py_dot(q_sub, cv) for _, cv in cents]

    coded = assigned.filter(
        F.col("cell").isin(probed) & (F.col(id_col) != query_id)
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        *_pq_code_cols(pq_books, d_sub),
    )
    terms = F.array(
        *[
            F.element_at(
                # one parsed array literal per LUT (same doubles —
                # repr round-trips losslessly)
                _lit_vec(luts[sub]),
                (F.col(f"code_{sub}") + 1).cast("int"),
            )
            for sub, _ in pq_books
        ]
    )
    scored = coded.select(
        F.lit(query_id).cast("long").alias("query_id"),
        "neighbor_id",
        "cell",
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x).alias("adc_score"),
    )
    return scored.orderBy(F.col("adc_score").desc(), F.col("neighbor_id")).limit(k)


def pq_reconstruction_err2(
    df: DataFrame,
    books: PQCodebooks,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-(vector, subspace) squared PQ reconstruction error
    ``(sub, err2)``: encode row-locally (max-dot assignment, ties to
    the larger code — exactly :func:`_pq_code_cols`), pick the chosen
    centroid from the code-indexed literal array, and fold
    ``(sv[p] − cv[p])²`` in ascending position order (the pinned-fold
    parity contract). Zero corpus shuffle; the caller aggregates."""
    d_sub = dim // len(books)
    e = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    structs = []
    for sub, cents in books:
        lo = sub * d_sub
        sv = F.slice("v", lo + 1, d_sub)
        # Same O(m) expression construction as _pq_code_cols (the
        # per-code comprehension built m×k dot_expr lambda trees of
        # driver-side py4j time per bench pass); element_at over the
        # literal codebook yields identical vectors, so the encode and
        # the error fold are bit-identical.
        codes = [int(code) for code, _ in cents]
        vecs = [[float(x) for x in cv] for _, cv in cents]
        cb = _lit_mat(vecs)
        ci = F.lit(codes)
        idx = F.sequence(F.lit(1), F.lit(len(cents)))
        def _mk(sv, cb, ci):
            return lambda i: F.struct(
                dot_expr(sv, F.element_at(cb, i)).alias("c"),
                F.element_at(ci, i).cast("long").alias("i"),
            )

        cands = F.transform(idx, _mk(sv, cb, ci))
        code = F.array_max(cands).getField("i")
        by_code = _lit_mat(
            [
                [float(x) for x in cv]
                for _, cv in sorted(cents, key=lambda t: t[0])
            ]
        )
        chosen = F.element_at(by_code, (code + 1).cast("int"))
        err2 = F.aggregate(
            F.zip_with(sv, chosen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(F.lit(sub).cast("int").alias("sub"), err2.alias("err2"))
        )
    return e.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.sub", "s.err2"
    )
