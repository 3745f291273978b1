"""Measure ANN recall vs the exact ground truth at a given sf dir.

Two measurements:
* batch self-KNN: recall@k of `knn_join_ivf` vs `knn_join_brute`
  (every vec_id % 50 = 0 query batch);
* single-query top-10: recall of `pq_ann_topk` (raw ADC ranks) and
  `pq_rescore_topk` (ADC shortlist + exact rescore) vs `cosine_topk`.

Prints one JSON line:

    {"sf_dir": ..., "k": 5, "recall_ivf": 0.xx, "n_queries": N,
     "recall_pq_adc": 0.x, "recall_pq_rescore": 0.x}

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

    truth10 = {r.neighbor_id for r in QUERIES["cosine_topk"](spark, sf_dir).collect()}
    adc10 = {r.neighbor_id for r in QUERIES["pq_ann_topk"](spark, sf_dir).collect()}
    res10 = {
        r.neighbor_id for r in QUERIES["pq_rescore_topk"](spark, sf_dir).collect()
    }
    ivfpq10 = {
        r.neighbor_id for r in QUERIES["ivfpq_ann_topk"](spark, sf_dir).collect()
    }
    out = {
        "sf_dir": sf_dir,
        "k": int(k),
        "recall_ivf": round(hits / (n_queries * k), 4),
        "n_queries": int(n_queries),
        "recall_pq_adc": round(len(truth10 & adc10) / len(truth10), 4),
        "recall_pq_rescore": round(len(truth10 & res10) / len(truth10), 4),
        "recall_ivfpq": round(len(truth10 & ivfpq10) / len(truth10), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
