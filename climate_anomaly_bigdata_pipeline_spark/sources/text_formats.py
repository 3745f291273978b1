"""Spec-driven text parsers (SURVEY §2.2 P1-P4).

The reference parses two climate text formats inline: a
whitespace-delimited file with ``%`` comment lines (Berkeley Earth,
``jobs/02_bronze_to_silver.py:18-25``) and a fixed-width station file
(GHCND, ``jobs/02_bronze_to_silver.py:50-61``). Both generalize to
spec-driven operators:

* :func:`filter_comments` — P1 comment/header filter.
* :func:`parse_delimited` — P2+P3 tokenizer + positional cast
  projection. Preserves the reference's null semantics: an
  out-of-range ordinal or an uncastable token yields null (the quirk
  that silently empties the reference's fallback path, SURVEY §2.1 S2).
* :func:`parse_fixed_width` — P4, a ``[(name, pos, len, type)]`` spec
  with 1-based positions matching the published GHCND layout.

All three are pure column expressions — no UDFs — so they run inside
whole-stage codegen and scale with the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (column name, ordinal index, cast type) for delimited layouts.
DelimitedField = tuple[str, int, str]
#: (column name, 1-based position, length, cast type) for fixed-width.
FixedWidthField = tuple[str, int, int, str]

# The reference's Berkeley Earth layout (jobs/02_bronze_to_silver.py:20-25):
# tokens[1..3] are year/month/day, [5] the anomaly; [0] (date-number) and
# [4] (day-of-year) are skipped.
BERKELEY_DAILY_SPEC: list[DelimitedField] = [
    ("year", 1, "int"),
    ("month", 2, "int"),
    ("day", 3, "int"),
    ("anomaly", 5, "float"),
]

# The GHCND stations layout (jobs/02_bronze_to_silver.py:50-61; 1-based).
GHCND_STATIONS_SPEC: list[FixedWidthField] = [
    ("station_id", 1, 11, "string"),
    ("latitude", 13, 8, "float"),
    ("longitude", 22, 9, "float"),
    ("elevation", 32, 6, "float"),
    ("state", 39, 2, "string"),
    ("name", 42, 30, "string"),
]


def filter_comments(
    df: DataFrame, value_col: str = "value", prefix: str = "%"
) -> DataFrame:
    """Drop comment/header lines (P1: ``~col.startswith(prefix)``)."""
    return df.filter(~F.col(value_col).startswith(prefix))


def parse_delimited(
    df: DataFrame,
    spec: Sequence[DelimitedField],
    value_col: str = "value",
    delimiter: str = r"\s+",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Tokenize ``value_col`` and project ordinal fields with casts.

    ``split(trim(value), delimiter)[i].cast(t)`` per field — out-of-range
    index and failed cast both yield null (ANSI mode off), exactly the
    reference's semantics at ``jobs/02_bronze_to_silver.py:19-25``.
    """
    parts = F.split(F.trim(F.col(value_col)), delimiter)
    cols = [parts[i].cast(t).alias(name) for name, i, t in spec]
    return df.select(*[F.col(k) for k in keep], *cols)


def parse_fixed_width(
    df: DataFrame,
    spec: Sequence[FixedWidthField],
    value_col: str = "value",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Extract trimmed, cast fields from 1-based (pos, len) slices.

    ``trim(substring(value, pos, len)).cast(t)`` per field
    (``jobs/02_bronze_to_silver.py:54-61``). A slice past the end of a
    short line yields an empty string → null after cast (for numeric
    types), preserving reference behavior on truncated rows.
    """
    cols = [
        F.trim(F.substring(F.col(value_col), pos, length)).cast(t).alias(name)
        for name, pos, length, t in spec
    ]
    out = df.select(*[F.col(k) for k in keep], *cols)
    # Empty-string strings should be null too (a blank fixed-width field
    # is "missing", not ""): normalize string fields.
    for name, _, _, t in spec:
        if t == "string":
            out = out.withColumn(
                name, F.when(F.col(name) == "", None).otherwise(F.col(name))
            )
    return out
