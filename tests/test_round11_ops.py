"""Round-11 regression tests — storage-layout hardening (ADVICE r10).

The bucketed-layout register path must never serve files written under
a DIFFERENT spec (bucket count / schema / key): an exchange-free
SortMergeJoin over wrongly-bucketed files silently misjoins rows. The
marker written after each build pins the spec; these tests drive the
three repair paths: torn write (no _SUCCESS), missing marker, and
marker/spec mismatch.
"""

import json
import os

import pytest


def _toy(spark):
    return spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(20)], "k bigint, v double"
    )


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "bkt")


def _ensure(spark, table, loc, buckets=4):
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        _ensure_bucketed,
    )

    _ensure_bucketed(
        spark,
        table,
        loc,
        "k BIGINT, v DOUBLE",
        "k",
        lambda: _toy(spark),
        buckets,
    )


def test_bucketed_build_writes_marker(spark, loc):
    _ensure(spark, "r11_bkt_a", loc)
    assert os.path.exists(loc + ".json")
    spec = json.load(open(loc + ".json"))
    assert spec == {"buckets": 4, "schema": "k BIGINT, v DOUBLE", "key": "k"}
    assert spark.table("r11_bkt_a").count() == 20


def test_bucketed_torn_write_rebuilds(spark, loc):
    """Files present but _SUCCESS missing (a write that died mid-flight)
    must rebuild with overwrite, not error and not register."""
    _ensure(spark, "r11_bkt_b1", loc)
    os.remove(os.path.join(loc, "_SUCCESS"))
    _ensure(spark, "r11_bkt_b2", loc)  # fresh name → takes the repair path
    assert spark.table("r11_bkt_b2").count() == 20
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))


def test_bucketed_marker_mismatch_rebuilds(spark, loc):
    """A marker recording a different bucket count than requested must
    NOT be registered as-is — the files get rewritten under the new
    spec and the marker updated."""
    _ensure(spark, "r11_bkt_c1", loc, buckets=4)
    _ensure(spark, "r11_bkt_c2", loc, buckets=2)
    assert json.load(open(loc + ".json"))["buckets"] == 2
    assert spark.table("r11_bkt_c2").count() == 20


def test_partitioned_fact_marker_pins_layout_spec(spark, sf_dir):
    """The fact marker stores the writer spec (version/columns/
    partition), and a mismatching marker forces a rewrite."""
    from climate_anomaly_bigdata_pipeline_spark.queries import storageq as SQ

    path = SQ.ensure_partitioned_fact(spark, sf_dir)
    marker = os.path.join(os.path.dirname(path), "li_by_year.json")
    spec = json.load(open(marker))
    assert spec["version"] == SQ._FACT_LAYOUT_VERSION
    assert spec["columns"] == SQ._FACT_COLS
    # stale-writer simulation: bump the recorded version → must rewrite
    json.dump({**spec, "version": -1}, open(marker, "w"))
    before = os.path.getmtime(marker)
    SQ.ensure_partitioned_fact(spark, sf_dir)
    assert json.load(open(marker)) == spec
    assert os.path.getmtime(marker) >= before


def test_corpus_sig_missing_source_raises(spark, tmp_path):
    from climate_anomaly_bigdata_pipeline_spark.queries.storageq import (
        _corpus_sig,
    )

    with pytest.raises(OSError):
        _corpus_sig(str(tmp_path), "nope")


# ---- round-11 operator contracts ---------------------------------------------


def test_gemm_candidate_assignment_matches_full_codebook(spark):
    """assign_cells (GEMM candidates + exact rescore) must reproduce the
    full-codebook struct-max assignment bit-for-bit on random data."""
    import random

    from pyspark.sql import functions as F

    from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM

    random.seed(7)
    cents = [(i * 3, [random.uniform(-1, 1) for _ in range(16)]) for i in range(37)]
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    e = SIM._normed(df, "vec_id", "embedding")
    fast = {
        r["vec_id"]: r["cell"]
        for r in SIM.assign_cells(e, cents).select("vec_id", "cell").collect()
    }
    slow = {
        r["vec_id"]: r["cell"]
        for r in e.withColumn(
            "cell", F.array_max(SIM._cell_assign_structs(cents)).getField("i")
        )
        .select("vec_id", "cell")
        .collect()
    }
    assert fast == slow


def test_cell_candidates_cover_top_nprobe(spark):
    """with_cell_candidates(topn=n) must return a superset of the exact
    top-n cells per row (sorted-prefix equality through the rescore)."""
    import random

    from pyspark.sql import functions as F

    from climate_anomaly_bigdata_pipeline_spark.operators import similarity as SIM

    random.seed(11)
    cents = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    e = SIM._normed(df, "vec_id", "embedding")
    got = (
        SIM.with_cell_candidates(e, cents, topn=3)
        .withColumn(
            "top3",
            F.slice(
                F.reverse(F.array_sort(SIM._cand_cell_structs(cents))), 1, 3
            ),
        )
        .select("vec_id", F.transform("top3", lambda s: s.getField("i")).alias("t"))
        .collect()
    )
    ref = (
        e.withColumn(
            "top3",
            F.slice(
                F.reverse(F.array_sort(SIM._cell_assign_structs(cents))), 1, 3
            ),
        )
        .select("vec_id", F.transform("top3", lambda s: s.getField("i")).alias("t"))
        .collect()
    )
    assert {r["vec_id"]: list(r["t"]) for r in got} == {
        r["vec_id"]: list(r["t"]) for r in ref
    }


def test_lpa_modularity_identities(spark, sf_dir):
    """Σ_c D_c = 2m (degree partition identity) is implicit; check the
    reported row's invariants: intra ≤ m and -0.5 ≤ Q ≤ 1."""
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    r = QUERIES["lpa_modularity"](spark, sf_dir).collect()[0]
    assert 0 <= r.intra_edges <= r.n_edges
    assert -0.5 <= r.modularity <= 1.0
    assert r.n_communities >= 1


def test_pair_packing_bounds(spark, sf_dir):
    """Pair packing can never beat the fractional floor and never does
    worse than one doc per sequence."""
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    r = QUERIES["greedy_pair_packing_stats"](spark, sf_dir).collect()[0]
    assert r.n_seqs_pair >= r.n_seqs_floor
    assert r.n_seqs_pair <= r.n_docs  # pairing merges, never splits pairs up
    assert 0.0 <= r.pad_waste_frac < 1.0


def test_whitening_audit_invariants(spark, sf_dir):
    """Certificate form (r13): every tolerance boolean holds, the
    moment digest is the exact integer triple, and n matches the
    corpus row count."""
    from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    rows = QUERIES["embedding_whitening_audit"](spark, sf_dir).collect()
    assert [r.component for r in rows] == [0, 1, 2]
    n = Catalog(spark, sf_dir).embeddings.count()
    for r in rows:
        assert r.n_rows == n
        g, s, nd = r.moment_digest.split(":")
        assert int(nd) == n and int(g) != 0 and int(s) != 0
        assert r.eigenvalue_pos
        assert r.var_share_ok
        assert r.white_mean_ok
        assert r.white_var_ok


def test_psi_nonnegative(spark, sf_dir):
    """Every PSI term (q-p)·ln(q/p) is non-negative, so PSI >= 0."""
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    r = QUERIES["psi_event_value_drift"](spark, sf_dir).collect()[0]
    assert r.psi >= 0.0
    assert r.n_ref > 0 and r.n_target > 0


def test_stl_anomalies_are_the_top_residual_z(spark, sf_dir):
    """The returned rows must be ordered by |robust_z| descending."""
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    rows = QUERIES["stl_residual_anomalies"](spark, sf_dir).collect()
    azs = [abs(r.robust_z) for r in rows]
    assert azs == sorted(azs, reverse=True)
    assert len(rows) == 10


def test_dedup_impact_totals_consistent(spark, sf_dir):
    """kept <= total on every axis; duplicate fraction matches counts."""
    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES

    rows = QUERIES["dedup_impact_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert 0 < r.tokens_kept <= r.tokens_total
        assert 0 < r.bytes_kept <= r.bytes_total
        assert abs(
            r.token_dup_frac - round(1.0 - r.tokens_kept / r.tokens_total, 6)
        ) < 1e-9
