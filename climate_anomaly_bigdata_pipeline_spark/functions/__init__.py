"""Scalar/aggregate expression helpers (SURVEY §2.7 + oracle-parity tools).

The key cross-engine correctness tool here is exact decimal money
arithmetic: a ``sum`` of doubles is accumulation-order-dependent, so
Spark (partial aggregation over shuffled partitions) and a single-node
oracle can disagree in the last bits — and ``round(x, 2)`` turns a
1e-11 disagreement into a visible 0.01 mismatch whenever the true sum
sits near a rounding boundary. Casting factors to DECIMAL first makes
the sum exact, order-independent, and bit-identical across engines
(double→decimal conversion can never tie, since no binary double sits
exactly between two scale-6 decimals).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type used for money factors: wide enough for 100 TB-scale
#: sums after aggregation (sum type widens to decimal(38, s)).
MONEY = "decimal(18,6)"

#: Narrower decimal for *squared* moment sums: the product of two
#: decimals must fit both engines' 38-digit cap (DuckDB rejects
#: DECIMAL(18)×DECIMAL(18)), so values are bounded to 11 integer digits
#: here — ample for per-group measures, not for raw 100 TB totals.
MOMENT = "decimal(15,4)"


def dec(col: str | Column) -> Column:
    """Cast a double factor to exact decimal for order-independent sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dec_m(col: str | Column) -> Column:
    """Cast to the moment-sum decimal (see ``MOMENT``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MOMENT)


def dec_sum(col: str | Column, scale: int = 2, name: str | None = None) -> Column:
    """Exact decimal sum of a double column, rounded and emitted as double."""
    out = F.round(F.sum(dec(col)), scale).cast("double")
    return out.alias(name) if name else out


def revenue_expr(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """The discounted-revenue product in exact decimal:
    ``dec(price) * (1 - dec(discount))``."""
    return dec(price) * (F.lit(1).cast(MONEY) - dec(discount))


def dec_avg(col: str | Column, scale: int = 4, name: str | None = None) -> Column:
    """Order-independent average: exact decimal sum cast to double,
    divided by the count in double (both engines perform the identical
    two floating-point ops), then rounded."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(
        F.sum(dec(c)).cast("double") / F.count(c).cast("double"), scale
    )
    return out.alias(name) if name else out


def zscore_guarded(value: Column, mean: Column, std: Column, scale: int = 4) -> Column:
    """(x − mean)/std with the reference's zero/null-std guard
    (``jobs/03_silver_to_gold.py:118-121``)."""
    return F.when(std.isNull() | (std == 0), F.lit(0.0)).otherwise(
        F.round((value - mean) / std, scale)
    )
