"""PySpark-native analytics engine.

A ground-up rebuild of the query/data-processing capabilities of
``soufianmoussa/climate-anomaly-bigdata-pipeline`` (reference at
``/root/reference/``), expressed Spark-first: DataFrame/SQL logical plans
optimized by Catalyst, with Medallion-layer helpers, reusable analytic
operators (z-score anomaly detection, rolling windows, pivots,
percentiles), text-format parsers, and large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

The reference (~410 LoC, see SURVEY.md) is itself a PySpark client; this
engine generalizes its query semantics into parameterized, oracle-checked
operators designed for 100 TB scale.
"""

from climate_anomaly_bigdata_pipeline_spark.session import get_spark
from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog, TABLES

__all__ = ["get_spark", "Catalog", "TABLES"]

__version__ = "0.1.0"
