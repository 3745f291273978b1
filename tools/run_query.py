"""Run any registered query from the command line.

Usage:
    python tools/run_query.py --list [pattern]
    python tools/run_query.py <name> [sf_dir] [--explain] [--oracle] [-n N]

Examples:
    python tools/run_query.py zscore_anomaly
    python tools/run_query.py triangle_parts_copurchase /root/testdata/sf0.1 -n 5
    python tools/run_query.py join_revenue_by_nation_year --explain
    python tools/run_query.py groupby_kpis --oracle     # print the DuckDB SQL
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="parquet table dir (default sf0.01)",
    )
    ap.add_argument("--list", metavar="PATTERN", nargs="?", const="",
                    help="list registered queries (optional substring filter)")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    ap.add_argument("--oracle", action="store_true",
                    help="print the query's DuckDB oracle SQL and exit")
    ap.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args()

    from climate_anomaly_bigdata_pipeline_spark.queries import ORACLE, QUERIES

    if args.list is not None:
        for name in sorted(QUERIES):
            if args.list.lower() in name.lower():
                print(name)
        return 0
    if not args.name:
        ap.error("query name required (or --list)")
    if args.name not in QUERIES:
        close = [n for n in QUERIES if args.name.lower() in n.lower()]
        print(f"unknown query {args.name!r}; close matches: {close[:10]}")
        return 1
    if args.oracle:
        print(ORACLE.get(args.name, "-- no oracle registered --"))
        return 0

    from climate_anomaly_bigdata_pipeline_spark.session import get_spark

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"({df.count()} rows total)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
