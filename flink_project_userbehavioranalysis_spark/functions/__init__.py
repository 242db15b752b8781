"""Reusable column-expression helpers shared across operators.

All helpers stay JVM-side (built-in functions only) — no Python UDFs
in any hot path. Money aggregation uses exact DECIMAL sums so results
are bit-identical across engines (a DOUBLE sum's value depends on
addition order, which differs between Spark partial aggregation and
the DuckDB oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Exact-money type used for all currency sums (see module docstring).
MONEY = "decimal(18,2)"


def win_end_s(window_col: str = "w") -> Column:
    """Window end as epoch seconds BIGINT (tz/precision-proof output)."""
    return F.col(f"{window_col}.end").cast("long").alias("window_end")


def win_start_s(window_col: str = "w") -> Column:
    return F.col(f"{window_col}.start").cast("long").alias("window_start")


def money(col: str | Column) -> Column:
    """Cast to the exact DECIMAL money type before summing."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def exact_avg(sum_dec: Column, cnt: Column) -> Column:
    """Deterministic average: exact DECIMAL sum -> DOUBLE, divided by an
    exact BIGINT count. Both inputs are exact, IEEE division is
    deterministic, so Spark and the oracle produce identical doubles."""
    return sum_dec.cast("double") / cnt
