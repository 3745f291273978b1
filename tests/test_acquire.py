"""Acquisition fallbacks (SURVEY §2.1 S1/S2): the synthetic generators
must produce files the Medallion pipeline parses to NON-empty silver —
the reference's fallback bug (5-column layout vs tokens[5]) fixed."""

from __future__ import annotations

from climate_anomaly_bigdata_pipeline_spark.plans import medallion as M
from climate_anomaly_bigdata_pipeline_spark.sources import acquire as AQ


def test_synthetic_fallback_flows_through_pipeline(spark, tmp_path):
    paths = AQ.acquire(str(tmp_path / "raw"))  # no URLs -> synthetic path

    bronze_b = M.ingest_bronze(spark, paths["berkeley"], "synthetic_berkeley")
    silver_b, rejects = M.bronze_to_silver_berkeley(bronze_b)
    n_valid = silver_b.count()
    assert n_valid > 0, "reference's fallback bug: empty silver"
    [rej] = rejects.collect()
    assert rej["null_anomaly"] == 0  # every synthetic row parses

    anomalies = silver_b.selectExpr(
        "min(anomaly) AS lo", "max(anomaly) AS hi"
    ).first()
    assert -2.0 <= anomalies["lo"] and anomalies["hi"] <= 2.0

    bronze_s = M.ingest_bronze(spark, paths["stations"], "synthetic_ghcnd")
    silver_s, _ = M.bronze_to_silver_stations(bronze_s)
    stations = silver_s.collect()
    assert len(stations) == 10
    assert all(r["station_id"].startswith("USW") for r in stations)

    gold = M.silver_to_gold(silver_b, silver_s, station_limit=5, z_threshold=2.0)
    assert gold["climate_anomalies_monthly"].count() > 0


def test_acquire_deterministic(tmp_path):
    p1 = AQ.acquire(str(tmp_path / "a"))
    p2 = AQ.acquire(str(tmp_path / "b"))
    assert open(p1["berkeley"]).read() == open(p2["berkeley"]).read()
    assert open(p1["stations"]).read() == open(p2["stations"]).read()
