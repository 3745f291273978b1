"""Measure ANN recall vs the exact-KNN ground truth at a given sf dir.

recall@k = |approx top-k ∩ exact top-k| / k, averaged over the query
batch (every vec_id % 50 = 0, the same batch `knn_join_brute` /
`knn_join_ivf` use). Prints one JSON line:

    {"sf_dir": ..., "k": 5, "recall_ivf": 0.xx, "n_queries": N}

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
from climate_anomaly_bigdata_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    exact = (
        QUERIES["knn_join_brute"](spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumnRenamed("neighbor_id", "exact_n")
    )
    approx = (
        QUERIES["knn_join_ivf"](spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumnRenamed("neighbor_id", "ivf_n")
    )
    k = exact.groupBy("query_id").count().agg(F.max("count")).first()[0]
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.exact_n == approx.ivf_n),
    ).count()
    n_queries = exact.select("query_id").distinct().count()
    out = {
        "sf_dir": sf_dir,
        "k": int(k),
        "recall_ivf": round(hits / (n_queries * k), 4),
        "n_queries": int(n_queries),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
