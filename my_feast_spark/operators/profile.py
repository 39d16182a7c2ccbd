"""Dataset profiling — the schema-health pass a pipeline runs before
training: per-column null counts and distinct cardinalities in ONE scan.

Scale shape: a single aggregate over the table — map-side partials
absorb everything, the reduce is one row. Cardinalities default to
``approx_count_distinct`` (HyperLogLog++, fixed-size sketch per column,
mergeable — the only sane answer at 100 TB); ``exact=True`` switches to
``count(DISTINCT col)``, which Catalyst lowers to one Expand over the
profiled columns (row multiplication x n_columns before the partial
aggregate) — the oracle-parity path, priced accordingly. The wide
one-row result is unpivoted driver-side into the long (column, stats)
relation via a literal stack — no second job, no shuffle.

No counterpart in the reference (its profiling is notebook
``.describe()`` calls); this is the engine-level primitive those
notebooks would need at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(
    df: DataFrame, columns: list[str] | None = None, *, exact: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one pass.

    Returns one row per column, sorted by name:
      ``column`` | ``n_rows`` | ``n_nulls`` | ``n_distinct``

    ``n_distinct`` counts non-null values; approximate by default
    (HLL++, rsd 5%), exact when ``exact=True`` (the engine-independent
    number an oracle can verify).
    """
    cols = sorted(columns) if columns is not None else sorted(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(ndv(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)

    # unpivot the one-row wide aggregate with a literal stack: n triples
    # of (name, nulls, distinct) — pure projection, no extra pass.
    # Column objects, not a selectExpr string: names with spaces/quotes
    # must not be parsed as SQL.
    n_rows = F.col("__n_rows")
    triples: list = []
    for c in cols:
        triples += [F.lit(c), n_rows - F.col(f"__nn_{c}"), F.col(f"__nd_{c}")]
    return (
        one.select(
            n_rows.alias("n_rows"),
            F.stack(F.lit(len(cols)), *triples).alias(
                "column", "n_nulls", "n_distinct"
            ),
        )
        .select("column", "n_rows", "n_nulls", "n_distinct")
    )


def profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str] | None = None,
    *,
    exact: bool = False,
) -> DataFrame:
    """Schema-drift report between two snapshots of the same table
    (yesterday's batch vs today's, upstream vs downstream of a
    migration): per-column null FRACTIONS and distinct cardinalities
    side by side, with deltas — the check a pipeline runs before
    blessing a new drop of training data.

    Fractions (not raw counts) are compared because the snapshots
    usually differ in row count. Each side is ONE scan (see
    ``column_profile``); the final join is over n_columns rows —
    driver-trivial at any data scale.
    """
    a = column_profile(df_a, columns, exact=exact)
    b = column_profile(df_b, columns, exact=exact)
    null_frac = lambda side: (  # noqa: E731 — tiny local expr builder
        F.round(F.col(f"n_nulls_{side}") / F.col(f"n_rows_{side}"), 6)
    )
    joined = (
        a.select(
            "column",
            F.col("n_rows").alias("n_rows_a"),
            F.col("n_nulls").alias("n_nulls_a"),
            F.col("n_distinct").alias("n_distinct_a"),
        ).join(
            b.select(
                "column",
                F.col("n_rows").alias("n_rows_b"),
                F.col("n_nulls").alias("n_nulls_b"),
                F.col("n_distinct").alias("n_distinct_b"),
            ),
            "column",
        )
    )
    return joined.select(
        "column",
        null_frac("a").alias("null_frac_a"),
        null_frac("b").alias("null_frac_b"),
        F.round(null_frac("b") - null_frac("a"), 6).alias("null_frac_delta"),
        "n_distinct_a",
        "n_distinct_b",
        (F.col("n_distinct_b") - F.col("n_distinct_a")).alias("n_distinct_delta"),
    )
