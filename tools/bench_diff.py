"""Diff two bench artifacts (BENCH_full.json-style per-query maps).

Prints the per-query ratio distribution and every mover beyond the
threshold, so round-over-round regressions are a mechanical check
instead of prose archaeology. Reads either a file path or a git ref
(ref:path) for each side.

Usage:
    python tools/bench_diff.py HEAD:BENCH_full.json BENCH_full.json
    python tools/bench_diff.py BENCH_r06.json BENCH_full.json --threshold 1.5
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def load(spec: str) -> dict[str, float]:
    if ":" in spec and not spec.endswith(".json"):
        raise SystemExit(f"unrecognized spec: {spec}")
    if ":" in spec:
        ref, path = spec.split(":", 1)
        raw = subprocess.run(
            ["git", "show", f"{ref}:{path}"], capture_output=True, text=True
        ).stdout
    else:
        with open(spec) as f:
            raw = f.read()
    doc = json.loads(raw)
    qs = doc.get("queries", doc)
    return {k: float(v) for k, v in qs.items()}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thresh = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    print(f"old: {len(old)} queries ({sum(old.values()):.1f}s)  "
          f"new: {len(new)} queries ({sum(new.values()):.1f}s)  "
          f"common: {len(common)}")
    if ratios:
        print(f"ratio median {statistics.median(ratios.values()):.3f}  "
              f"p90 {sorted(ratios.values())[int(0.9 * len(ratios))]:.3f}")
    for k in sorted(ratios, key=lambda k: -ratios[k]):
        if ratios[k] >= thresh:
            print(f"  REGR {ratios[k]:5.2f}x  {old[k]:7.3f} -> {new[k]:7.3f}  {k}")
    for k in sorted(ratios, key=lambda k: ratios[k]):
        if ratios[k] <= 1 / thresh:
            print(f"  IMPR {ratios[k]:5.2f}x  {old[k]:7.3f} -> {new[k]:7.3f}  {k}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", ", ".join(f"{k}={new[k]:.2f}" for k in only_new))
    return 0


if __name__ == "__main__":
    sys.exit(main())
