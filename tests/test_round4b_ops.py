"""Unit tests for the round-4 advanced-analytics batch: degree-ordered
triangle counting (vs a driver-side brute-force oracle on random
graphs) and the decorrelated TPC-H-style join shapes' invariants."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators import graph as G


def _brute_triangles_per_node(edges):
    """Driver-side oracle: count triangles at each vertex."""
    adj: dict = {}
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangles_match_brute_force_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 20 + trial * 10
        m = 3 * n
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r.node: r.n_triangles
            for r in G.triangles_per_node(df).collect()
        }
        assert got == _brute_triangles_per_node(edges), f"trial {trial}"


def test_triangles_count_each_triangle_once_regardless_of_duplicates(spark):
    # K4 given with duplicate + reversed edges: 4 triangles, each node in 3.
    base = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(base + base[:5], "u long, v long")
    got = {r.node: r.n_triangles for r in G.triangles_per_node(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph_returns_empty(spark):
    # A 6-cycle has no triangles.
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc, "u long, v long")
    assert G.triangles_per_node(df).count() == 0
