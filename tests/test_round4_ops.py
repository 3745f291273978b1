"""Unit tests for round-4 operators: large-star/small-star connected
components, trained IVF codebook, PNG decode, mergeable quantile
rollup, CMS fallback."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import dedup as D


# ---- large-star / small-star connected components ---------------------------


def _labels(df):
    return {r.node: r.cluster_id for r in df.collect()}


def _cc_oracle(edges):
    """Driver-side union-find ground truth for small graphs."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component min; path-compress fully
    return {x: find(x) for x in parent}


def test_star_cc_matches_propagation_and_oracle_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = 60 + trial * 40
        m = n + rng.randrange(n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        want = _cc_oracle(edges)
        got_star = _labels(D.connected_components_star(df))
        got_prop = _labels(D.connected_components(df, max_iter=100))
        assert got_star == want, f"trial {trial}: star != union-find"
        assert got_prop == want, f"trial {trial}: propagation != union-find"


def test_star_cc_converges_on_10k_chain_where_propagation_truncates(spark):
    """A 10k-node path graph has diameter 9999: min-label propagation at
    its default max_iter=20 CANNOT finish (labels move <=1 hop per
    round), while the star algorithm needs only O(log^2 n) rounds."""
    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id1"), (F.col("id") + 1).alias("id2")
    )
    out = D.connected_components_star(chain, max_iter=50)
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.max("cluster_id").alias("mx"),
    ).collect()[0]
    assert (agg.n, agg.k, agg.mx) == (n, 1, 0)

    # and the truncation it replaces is real: propagation at the default
    # cap leaves the chain split into many labels
    trunc = D.connected_components(chain)  # max_iter=20
    k_trunc = trunc.agg(F.countDistinct("cluster_id")).collect()[0][0]
    assert k_trunc > 1


def test_star_cc_handles_self_pairs_and_isolated_nodes(spark):
    df = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 3)], "id1 long, id2 long"
    )
    got = _labels(D.connected_components_star(df))
    assert got == {5: 5, 1: 1, 2: 1, 3: 1}


# ---- trained IVF codebook ---------------------------------------------------


def test_trained_ivf_codebook_beats_seed_recall(spark, sf_oracle_dir):
    """2 Lloyd iterations move centroids onto the label clusters the
    generator builds into `embeddings`, so the same nprobe recalls more
    of the brute-force top-k than the raw first-k seed codebook."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM

    emb = Catalog(spark, sf_oracle_dir).embeddings
    truth = {
        (r.query_id, r.neighbor_id)
        for r in SIM.knn_join(emb, query_pred=F.lit(True), k=5).collect()
    }

    def recall(iters: int) -> float:
        got = SIM.ivf_knn_join(
            emb, k=5, n_centroids=16, nprobe=2, train_iters=iters
        )
        hits = {(r.query_id, r.neighbor_id) for r in got.collect()}
        return len(hits & truth) / len(truth)

    r_seed, r_trained = recall(0), recall(2)
    assert r_trained >= r_seed, (r_seed, r_trained)


def _random_edits(rng, s: str, n: int) -> str:
    for _ in range(n):
        op = rng.choice("sid")
        i = rng.randrange(max(len(s), 1))
        ch = rng.choice("0123456789")
        if op == "s" and s:
            s = s[:i] + ch + s[i + 1 :]
        elif op == "i":
            s = s[:i] + ch + s[i:]
        elif op == "d" and s:
            s = s[:i] + s[i + 1 :]
    return s


def test_segmented_edit_pairs_equal_brute_pairs(spark):
    """PassJoin segment blocking is lossless: same pair set as the
    unblocked within-block quadratic join, on strings with random
    substitutions, insertions AND deletions (shifts exercise the +-k
    position windows), with and without a shared constant prefix."""
    rng = random.Random(7)
    rows = []
    rid = 0
    for prefix in ("", "Customer#"):
        for base_n in range(25):
            base = prefix + "".join(rng.choice("0123456789") for _ in range(9))
            for _ in range(rng.randrange(1, 4)):
                rows.append((rid, _random_edits(rng, base, rng.randrange(0, 3))))
                rid += 1
    df = spark.createDataFrame(rows, "cid long, name string").withColumn(
        "blk", F.lit(1)
    )
    brute = D.edit_distance_pairs(df, "cid", "name", ["blk"], max_dist=2)
    b = {(r.id1, r.id2, r.dist) for r in brute.collect()}
    for nseg, m in [(None, 1), (4, 2), (5, 3)]:
        seg = D.edit_distance_pairs_segmented(
            df, "cid", "name", ["blk"], max_dist=2, n_segments=nseg, min_matches=m
        )
        s = {(r.id1, r.id2, r.dist) for r in seg.collect()}
        assert s == b, (nseg, m, sorted(b - s)[:5], sorted(s - b)[:5])


def test_segmented_candidates_prune_vs_quadratic(spark):
    """On the sf0.1 customer table the (4 segments, 2 matches) block
    cuts candidates ~5x below the (nation, mktsegment)-block quadratic
    — and >=5x counting only pairs the verifier then rejects, which is
    the work the second blocking key exists to remove."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog

    cust = Catalog(spark, "/root/testdata/sf0.1").customer.select(
        "c_nationkey", "c_mktsegment", "c_custkey", "c_name"
    )
    quad = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
    )
    n_cand = D.segment_candidates(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"],
        max_dist=2, n_segments=4, min_matches=2,
    ).count()
    n_true = D.edit_distance_pairs_segmented(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"],
        max_dist=2, n_segments=4, min_matches=2,
    ).count()
    assert n_cand * 4.5 <= quad, (n_cand, quad)
    assert (n_cand - n_true) * 5 <= (quad - n_true), (n_cand, n_true, quad)


def test_train_ivf_codebook_zero_iters_is_seed(spark, sf_oracle_dir):
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM

    emb = Catalog(spark, sf_oracle_dir).embeddings
    seeds = SIM.train_ivf_codebook(emb, n_centroids=4, n_iters=0)
    assert [cid for cid, _ in seeds] == sorted(cid for cid, _ in seeds)
    trained = SIM.train_ivf_codebook(emb, n_centroids=4, n_iters=1)
    # ids stable across iterations; vectors move
    assert [cid for cid, _ in trained] == [cid for cid, _ in seeds]
    assert any(a != b for (_, a), (_, b) in zip(seeds, trained))
