"""Streaming subset bench: like bench.py but prints one line per query
AS IT COMPLETES (flushed), in the order given, single pass by default.

Built for long heavy-tail runs (sf1/sf10) where bench.py's single
end-of-run JSON line leaves a killed run with zero evidence.

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.scaledata/sf10 \
        python tools/bench_stream.py q1,q2,... [--runs N] [--out FILE]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", help="comma-separated query names, run in order")
    ap.add_argument("--runs", type=int, default=1, help="passes per query")
    ap.add_argument("--out", default="", help="write final JSON map here")
    args = ap.parse_args()

    from climate_anomaly_bigdata_pipeline_spark.queries import QUERIES
    from climate_anomaly_bigdata_pipeline_spark.session import get_spark

    names = [n for n in args.names.split(",") if n]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        "bench_stream", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    best: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        for _ in range(args.runs):
            t0 = time.perf_counter()
            try:
                force(QUERIES[name](spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                # a pass that errors poisons the query: drop any
                # earlier-pass timing so the artifact is unambiguous
                # (ERR xor OK, never both; ADVICE r8)
                best.pop(name, None)
                print(f"ERR  {name}: {errors[name]}", flush=True)
                break
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, dt), dt)
            gc.collect()
        if name in best:
            print(f"OK   {name}: {best[name]:.3f} s", flush=True)

    out = {
        "sf_dir": SF_DIR,
        "queries": {k: round(v, 3) for k, v in best.items()},
        "total": round(sum(best.values()), 3),
    }
    if errors:
        out["errors"] = errors
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
