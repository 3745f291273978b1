"""Round-6 guards: the no-silent-caps contract on
``cooccurrence_edges`` (VERDICT r5 item 5) and the k-core oracle
round-margin assertion (item 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import graph as G


def _mega_basket(spark):
    """One 12-item mega-group plus two small 3-item groups."""
    rows = [("big", i) for i in range(12)]
    rows += [("a", 100), ("a", 101), ("a", 102)]
    rows += [("b", 101), ("b", 102), ("b", 103)]
    return spark.createDataFrame(rows, "g string, it long")


def test_cooccurrence_oversize_error_detonates(spark):
    df = _mega_basket(spark)
    edges = G.cooccurrence_edges(
        df, "g", "it", min_support=1, max_group_size=10
    )
    with pytest.raises(Exception, match="max_group_size"):
        edges.collect()


def test_cooccurrence_error_mode_silent_when_under_cap(spark):
    df = _mega_basket(spark)
    rows = G.cooccurrence_edges(
        df, "g", "it", min_support=1, max_group_size=100
    ).collect()
    # 12 items in "big" → C(12,2)=66; "a"/"b" add C(3,2)=3 each.
    assert len(rows) == 66 + 3 + 3 - 1  # (101,102) shared by a and b

    weights = {(r.u, r.v): r.w for r in rows}
    assert weights[(101, 102)] == 2


def test_cooccurrence_oversize_observe_counts_drops(spark):
    df = _mega_basket(spark)
    edges = G.cooccurrence_edges(
        df, "g", "it", min_support=1, max_group_size=10,
        on_oversize="observe",
    )
    rows = edges.collect()
    # Mega-group gone; only the two small baskets' pairs remain.
    pairs = {(r.u, r.v) for r in rows}
    assert pairs == {
        (100, 101), (100, 102), (101, 102), (101, 103), (102, 103),
    }
    metric = edges.oversize_observation.get["oversize_groups_dropped"]
    assert metric == 1


def test_cooccurrence_oversize_drop_is_explicit_opt_in(spark):
    df = _mega_basket(spark)
    rows = G.cooccurrence_edges(
        df, "g", "it", min_support=1, max_group_size=10,
        on_oversize="drop",
    ).collect()
    assert len(rows) == 5
    with pytest.raises(ValueError):
        G.cooccurrence_edges(df, "g", "it", on_oversize="alert")


def test_kcore_fixpoint_margin_vs_unrolled_oracle(spark):
    """The kcore_copurchase oracle unrolls a FIXED number of peeling
    rounds (``_KCORE_ROUNDS``) while the engine iterates to fixpoint.
    Assert the engine's measured depth at sf0.1 (10× the driver's
    oracle SF) stays ≥2 rounds under the unroll so a window rotation
    or SF bump cannot silently diverge the two."""
    from climate_anomaly_bigdata_pipeline_spark.queries.advancedq import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    li = Catalog(spark, "/root/testdata/sf0.1").lineitem
    edges = G.cooccurrence_edges(
        li.select("l_orderkey", "l_partkey").distinct(),
        "l_orderkey",
        "l_partkey",
        min_support=2,
    ).select(F.col("u"), F.col("v"))
    core = G.k_core(edges, k=_KCORE_K)
    core.collect()
    assert core.kcore_rounds <= _KCORE_ROUNDS - 2, (
        f"engine peeled {core.kcore_rounds} rounds; oracle unrolls "
        f"{_KCORE_ROUNDS} — margin too thin"
    )
