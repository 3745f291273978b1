"""Physical-plan audit: parse ``explain("formatted")`` into the scale
facts that matter — the programmatic form of the "would this survive
100×?" review every operator goes through (SCALE.md).

Usage::

    from climate_anomaly_bigdata_pipeline_spark.plans.audit import audit_plan
    a = audit_plan(df)
    assert a["n_exchanges"] <= 1 and not a["has_cartesian"]

The counters count plan NODES (the `(n) Op` detail lines), not string
occurrences, so a node referenced twice in the tree view isn't double
counted. `tests/test_plans.py` asserts these properties per query; this
module makes the same checks available to users tuning their own
pipelines on the engine.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

_NODE = re.compile(r"^\(\d+\) (\w+)", re.M)
_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees ("codegen" explain mode —
    the formatted mode hides them under un-finalized AQE plans). Wider
    spans = more of the query running as generated JVM code; 0 means
    everything is interpreted — a hot-path smell."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return buf.getvalue().count("WholeStageCodegen subtree")


def audit_plan(df: DataFrame) -> dict:
    """Audit facts for a DataFrame's physical plan (see module doc).

    Keys: n_exchanges, n_broadcast_joins, n_sort_merge_joins,
    n_windows, n_aggregates, has_cartesian, has_single_partition,
    pushed_filters (list[str]), codegen_spans (int, via the "codegen"
    explain mode), node_counts (dict op -> n).
    """
    plan = formatted_plan(df)
    nodes = _NODE.findall(plan)
    counts: dict[str, int] = {}
    for n in nodes:
        counts[n] = counts.get(n, 0) + 1
    pushed: list[str] = []
    for m in _PUSHED.finditer(plan):
        pushed += [f.strip() for f in m.group(1).split(",") if f.strip()]
    return {
        "n_exchanges": counts.get("Exchange", 0),
        "n_broadcast_joins": counts.get("BroadcastHashJoin", 0),
        "n_sort_merge_joins": counts.get("SortMergeJoin", 0),
        "n_windows": counts.get("Window", 0),
        "n_aggregates": counts.get("HashAggregate", 0)
        + counts.get("SortAggregate", 0)
        + counts.get("ObjectHashAggregate", 0),
        "has_cartesian": "CartesianProduct" in counts
        or "BroadcastNestedLoopJoin" in counts,
        "has_single_partition": "SinglePartition" in plan,
        "pushed_filters": pushed,
        "codegen_spans": codegen_spans(df),
        "node_counts": counts,
    }
