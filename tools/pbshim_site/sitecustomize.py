"""Opt-in interpreter hook: add this directory to PYTHONPATH and every
Python process (critically: forked PySpark *workers*, which import the
generated StateMessage protobuf code before any user code runs) gets
the google.protobuf bridge at startup. See compat/pbshim.py."""

try:
    import sys

    sys.path.insert(0, "/root/repo")
    from climate_anomaly_bigdata_pipeline_spark.compat import pbshim

    pbshim.install()
except Exception:  # noqa: BLE001 — never break interpreter startup
    pass
