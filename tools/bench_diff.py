"""Diff two bench artifacts (BENCH_full.json-style per-query maps).

Prints the per-query ratio distribution and every mover beyond the
threshold, so round-over-round regressions are a mechanical check
instead of prose archaeology. Reads either a file path or a git ref
(ref:path) for each side. Queries whose full-map timing is a known
measurement artifact (GC debt accumulated from earlier queries in the
same long-lived JVM — see BASELINE.md "measurement artifacts") are
annotated so a mechanical diff doesn't report phantom regressions.

Usage:
    python tools/bench_diff.py HEAD:BENCH_full.json BENCH_full.json
    python tools/bench_diff.py BENCH_r06.json BENCH_full.json --threshold 1.5
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

# Queries whose in-map timing is dominated by JVM/GC state left by the
# ~150 queries that ran before them, not by their own plan. Verified by
# isolated warm timings recorded in BASELINE.md (e.g. jpeg_decode_profile:
# 10.9 s in the r7 map vs 1.20 s isolated-warm).
KNOWN_ARTIFACT = {
    "jpeg_decode_profile": "GC debt in full-map runs; 1.2s isolated-warm",
    "zscore_lineitem": "GC debt in full-map runs; 1.6s isolated-warm",
    "flac_decode_profile": "GC debt in full-map runs; 1.0s isolated-warm",
}


def load(spec: str) -> dict[str, float]:
    if ":" in spec and not spec.endswith(".json"):
        raise SystemExit(f"unrecognized spec: {spec}")
    if ":" in spec:
        ref, path = spec.split(":", 1)
        proc = subprocess.run(
            ["git", "show", f"{ref}:{path}"], capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise SystemExit(
                f"git show {ref}:{path} failed: {proc.stderr.strip()}"
            )
        raw = proc.stdout
    else:
        with open(spec) as f:
            raw = f.read()
    doc = json.loads(raw)
    qs = doc.get("queries", doc)
    return {k: float(v) for k, v in qs.items()}


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("old", help="file path or ref:path for the baseline side")
    ap.add_argument("new", help="file path or ref:path for the candidate side")
    ap.add_argument("--threshold", type=float, default=1.5)
    ns = ap.parse_args()
    thresh = ns.threshold
    old, new = load(ns.old), load(ns.new)
    common = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    print(f"old: {len(old)} queries ({sum(old.values()):.1f}s)  "
          f"new: {len(new)} queries ({sum(new.values()):.1f}s)  "
          f"common: {len(common)}")
    if ratios:
        print(f"ratio median {statistics.median(ratios.values()):.3f}  "
              f"p90 {sorted(ratios.values())[int(0.9 * len(ratios))]:.3f}")

    def note(k: str) -> str:
        return (
            f"  [known artifact: {KNOWN_ARTIFACT[k]}]"
            if k in KNOWN_ARTIFACT
            else ""
        )

    for k in sorted(ratios, key=lambda k: -ratios[k]):
        if ratios[k] >= thresh:
            print(f"  REGR {ratios[k]:5.2f}x  {old[k]:7.3f} -> "
                  f"{new[k]:7.3f}  {k}{note(k)}")
    for k in sorted(ratios, key=lambda k: ratios[k]):
        if ratios[k] <= 1 / thresh:
            print(f"  IMPR {ratios[k]:5.2f}x  {old[k]:7.3f} -> "
                  f"{new[k]:7.3f}  {k}{note(k)}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", ", ".join(f"{k}={new[k]:.2f}" for k in only_new))
    return 0


if __name__ == "__main__":
    sys.exit(main())
