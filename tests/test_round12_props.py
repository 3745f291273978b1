"""Property/parity tests for the round-12 primitives: each pins the
EQUIVALENCE the operator's docstring claims against an independent
implementation (window functions, brute-force Python), not just shape.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_running_max_strict_equals_window(spark):
    """Distributed strict prefix max == the single-partition window
    form, on shuffled data with duplicate values and several range
    partitions."""
    from climate_anomaly_bigdata_pipeline_spark.operators.relational import (
        running_max_strict,
    )

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 50)) for i in range(997)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["m"]
        for r in running_max_strict(df, ["k"], "v", out_col="m", n_parts=7)
        .select("k", "m")
        .collect()
    }
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["k"]: r["m"]
        for r in df.select("k", F.max("v").over(w).alias("m")).collect()
    }
    assert got == want
    assert got[min(got)] is None  # first row has no strict prefix


def _brute_ktruss(edges: set, k_max: int) -> list:
    """Reference peel: recompute support from scratch each round."""
    cur = set(edges)
    out = []
    for k in range(3, k_max + 1):
        while True:
            adj = {}
            for u, v in cur:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            keep = {
                (u, v)
                for u, v in cur
                if len(adj[u] & adj[v]) >= k - 2
            }
            if keep == cur:
                break
            cur = keep
        nodes = {x for e in cur for x in e}
        out.append((k, len(cur), len(nodes)))
    return out


def test_ktruss_matches_bruteforce_on_random_graphs(spark):
    from climate_anomaly_bigdata_pipeline_spark.operators.graph import (
        ktruss_decomposition,
    )

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n, m = 24, 70
        edges = set()
        while len(edges) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = ktruss_decomposition(df, k_max=5, max_rounds=12)
        want = _brute_ktruss(edges, 5)
        assert got == want, (seed, got, want)


def test_ivf_candidates_filter_equals_knn_join_per_nprobe(spark, sf_dir):
    """The sharing contract ivf_recall_vs_nprobe rides on: filtering
    the probe-rank-tagged candidates to rank <= p and taking the
    per-query top-k is BIT-IDENTICAL to ivf_knn_join at nprobe = p
    over the same assignment."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.operators import (
        similarity as SIM,
    )

    emb = Catalog(spark, sf_dir).embeddings
    e = SIM._normed(emb, "vec_id", "embedding").localCheckpoint()
    book = SIM.train_ivf_codebook(emb, 8, 1, sample_mod=4, normed=e)
    assigned = SIM.ivf_assignment(e, book, topn=4)
    cands = SIM.ivf_knn_candidates(assigned, k=5, nprobe=4).localCheckpoint()
    for p in (1, 2, 4):
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        via_cands = {
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in cands.filter(F.col("probe_rank") <= p)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect()
        }
        via_join = {
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in SIM.ivf_knn_join(
                emb, k=5, nprobe=p, codebook=book, assigned=assigned
            ).collect()
        }
        assert via_cands == via_join, p
