"""Skew defenses for large-state aggregations.

Spark's hash aggregation already does map-side partial aggregation, so
sum/count/min/max never need salting — a hot key's partials merge cheaply.
The aggregations that DO blow up on hot keys are the ones whose per-key
state is large: ``collect_set``/``collect_list`` (state = the set itself)
and exact distinct counts. AQE splits skewed *joins* but not skewed
*aggregation* keys, so these two rewrites are the manual lever:

  * salted_collect_set — two-stage: groupBy(keys, salt) builds bounded
    partial sets in parallel, then groupBy(keys) unions them. A hot key's
    set is built by ``num_salts`` tasks instead of one.
  * exact_count_distinct — the classic re-aggregation: distinct on
    (keys, value) first (the shuffle key includes the value, so hot keys
    spread across partitions by value), then a cheap count per key.

Both are semantics-preserving rewrites; results are identical to the
direct single-stage aggregation (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    num_salts: int = 16,
    out_col: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """collect_set per key via salted two-stage aggregation.

    Stage 1 groups by (keys..., salt) — the hot key's rows spread over
    ``num_salts`` tasks, each building a bounded partial set; stage 2
    unions the partials per key. The salt is derived from the value (not
    random), so re-runs are deterministic and equal values land in the
    same partial set (smaller stage-2 payload)."""
    keys = list(keys)
    out_col = out_col or f"{value_col}_set"
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.collect_set(value_col).alias("__part"))
    )
    merged = partial.groupBy(*keys).agg(
        F.array_distinct(F.flatten(F.collect_list("__part"))).alias(out_col)
    )
    if sort:
        merged = merged.withColumn(out_col, F.array_sort(F.col(out_col)))
    return merged


def exact_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without hot-key state blowup:
    distinct over (keys, value) — shuffle key includes the value, so a hot
    key's rows spread across partitions — then count per key. Use
    ``approx_count_distinct`` instead when a ~2% error is acceptable: one
    stage, constant state (HLL sketch)."""
    keys = list(keys)
    out_col = out_col or f"n_distinct_{value_col}"
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
