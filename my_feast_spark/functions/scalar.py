"""Scalar expression helpers — native rewrites of the reference's UDFs.

The reference's only Python UDF (U1, chicago_weather_hourly_fs.py:22-29)
priority-collapses an array<string> of precipitation types. A row-at-a-time
Python UDF blocks codegen and predicate pushdown; the same semantics are a
pure Column expression — JVM-side, pushdown-friendly, ~100x cheaper at
scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_round(col: Column, dp: int) -> Column:
    """Cross-engine-stable ``round(col, dp)``: the explicit
    ``floor(x * 1e{dp} + 0.5) / 1e{dp}`` form (round-half-toward-+inf,
    negative-safe).

    The engines' NATIVE round() functions disagree on doubles whose
    shortest-decimal repr sits on a .5 boundary — Spark rounds the
    decimal repr HALF_UP, DuckDB snaps the binary scaled value — even
    when both engines hold the bit-identical double (the 0.43725 class
    the round-8 tri-scale sweep caught). This form evaluates the same
    IEEE multiply/add/floor/divide on both sides, so identical inputs
    round identically. Use it for every rounded measure an oracle
    replays; for ``round(avg(...))`` of dp-grained sources prefer
    ``workload._stable_round_avg``, which ALSO fixes summation order.
    """
    p = float(10**dp)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def priority_collapse(col: Column, priorities: list[str], default: str) -> Column:
    """First priority value present in the array wins, else default.

    ``priority_collapse(c, ["snow", "rain"], "no")`` == the reference's
    ``precipitation(_set)`` UDF: snow > rain > no.
    """
    expr = F.lit(default)
    for p in reversed(priorities):
        expr = F.when(F.array_contains(col, p), p).otherwise(expr)
    return expr


def hour_bucket(col: Column) -> Column:
    """Typed hour truncation — replaces the reference's
    ``date_format(ts, 'yyyy-MM-dd HH:00:00')`` string idiom (F3)."""
    return F.date_trunc("hour", col)


def percentile_agg(
    col: Column | str, probability: float, *, exact: bool = False,
    accuracy: int = 10000,
) -> Column:
    """Percentile aggregate with a scale-safe DEFAULT: ``percentile_approx``
    (mergeable quantile sketch — bounded memory per partial agg, relative
    error ~1/accuracy) unless ``exact=True`` (Spark ``percentile``, which
    buffers every value per group; a single-group corpus quantile is an
    executor OOM at 100 TB).

    The workload queries pass ``exact=True`` because the DuckDB oracle's
    ``quantile_cont`` shares exact linear-interpolation semantics — the
    sketch does not hash-match across engines. That is a small-SF parity
    choice; any scale run keeps the default.
    """
    c = F.col(col) if isinstance(col, str) else col
    if exact:
        return F.percentile(c, F.lit(probability))
    return F.percentile_approx(c, F.lit(probability), F.lit(accuracy))
