"""Regenerate the machine-derived registry section of COVERAGE.md.

The curated SURVEY-§2 mapping above the marker is hand-maintained;
everything between the BEGIN/END markers is emitted from the live
query registry + the driver's CORRECTNESS_r*.json artifacts, so the
judge/driver can diff coverage mechanically instead of trusting prose.
``tests/test_coverage_fresh.py`` asserts the committed file matches a
fresh regeneration (stale = red CI).

Usage: python tools/gen_coverage.py [--check]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")
BEGIN = "<!-- BEGIN GENERATED REGISTRY (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED REGISTRY -->"


def _artifact_maps(source: str) -> list[tuple[int, dict]]:
    """(round number, parsed CORRECTNESS json) pairs.

    source="worktree": the files on disk (what a regeneration uses).
    source="pinned": the files AS COMMITTED at the last commit that
    touched COVERAGE.md. The driver writes CORRECTNESS_r{N}.json AFTER
    the builder's final commit by construction, so a worktree-only
    freshness gate goes red after every driver run (VERDICT r8 finding);
    the pinned view is what the committed table could actually have
    been rendered from.
    """
    import subprocess

    pairs: list[tuple[int, str]] = []  # (round, content)
    if source == "worktree":
        for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if m:
                with open(path) as f:
                    pairs.append((int(m.group(1)), f.read()))
    else:
        try:
            cov_commit = subprocess.run(
                ["git", "log", "-n1", "--format=%H", "--", "COVERAGE.md"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.strip()
            names = subprocess.run(
                ["git", "ls-tree", "--name-only", cov_commit],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.split()
        except Exception:
            return _artifact_maps("worktree")
        for name in sorted(names):
            m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
            if not m:
                continue
            content = subprocess.run(
                ["git", "show", f"{cov_commit}:{name}"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout
            pairs.append((int(m.group(1)), content))
    return [(rnum, json.loads(content)) for rnum, content in pairs]


def driver_rounds(source: str = "worktree") -> dict[str, list[int]]:
    """query name -> rounds with a green driver CORRECTNESS row."""
    rounds: dict[str, list[int]] = {}
    for rnum, data in _artifact_maps(source):
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("err") is None
            ):
                rounds.setdefault(name, []).append(rnum)
    return rounds


def render(source: str = "worktree") -> str:
    from climate_anomaly_bigdata_pipeline_spark.queries import ORACLE, QUERIES

    verified = driver_rounds(source)
    pending = [n for n in QUERIES if n not in verified]
    in_window = set(list(QUERIES)[:50])
    pending_txt = (
        "All queries have ≥1 driver-green row."
        if not pending
        else "Driver-pending (no green CORRECTNESS row yet): "
        + ", ".join(
            f"`{n}`" + (" (in active window)" if n in in_window else "")
            for n in pending
        )
        + "."
    )
    lines = [
        BEGIN,
        "",
        "## Registry (generated — do not edit by hand)",
        "",
        f"**{len(QUERIES)} registered queries**, "
        f"{len(ORACLE)} with DuckDB oracles, "
        f"{sum(1 for n in QUERIES if n in verified)} with ≥1 green "
        "driver-verified CORRECTNESS row. Position = current registry "
        "order (driver verifies positions 1-50).",
        "",
        pending_txt,
        "",
        "| # | Query | Module | Oracle | Driver-green rounds | Pending |",
        "|---|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        mod = fn.__module__.rsplit(".", 1)[-1]
        oracle = "yes" if name in ORACLE else "—"
        rounds = ", ".join(f"r{r}" for r in verified.get(name, [])) or "—"
        pend = "pending" if name not in verified else "—"
        lines.append(
            f"| {i} | `{name}` | `{mod}` | {oracle} | {rounds} | {pend} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    with open(COVERAGE) as f:
        current = f.read()
    section = render()
    if BEGIN in current:
        pre = current.split(BEGIN)[0]
        post = current.split(END, 1)[1] if END in current else "\n"
        updated = pre + section + post
    else:
        updated = current.rstrip() + "\n\n" + section + "\n"
    if "--check" in sys.argv:
        if updated != current:
            print("COVERAGE.md registry section is STALE — run "
                  "python tools/gen_coverage.py")
            return 1
        print("COVERAGE.md registry section is fresh")
        return 0
    with open(COVERAGE, "w") as f:
        f.write(updated)
    print(f"wrote registry section ({len(section.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
