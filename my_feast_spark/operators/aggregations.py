"""Aggregation operators — time-bucketed feature aggregation and
latest-per-key snapshots.

Mirrors the reference's gold-layer jobs:
  * hourly feature agg — groupBy(entity, hour).agg(avg/sum/count)
    (chicago_taxi_trips_hourly_gold.ipynb:73-99, chicago_weather_hourly_fs.py:31-53);
  * MAX-created / ROW_NUMBER latest-version dedup (CASE.MD:431-464);
  * materialization's latest-row-per-entity snapshot
    (chicago_taxi_trips_hourly_gold.ipynb:473-479).

All are plain hash aggregations / windows: Catalyst runs partial+final
aggregation (map-side combine) automatically, so the shuffle carries
pre-aggregated state, not raw rows — the property that matters at 100 TB.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: agg-name -> builder; each returns an unaliased Column over a value col.
_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev,
    "collect_set_sorted": lambda c: F.array_sort(F.collect_set(c)),
    "approx_count_distinct": F.approx_count_distinct,
}


def time_bucket_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    aggs: Mapping[str, tuple[str, str]],
    *,
    bucket: str = "hour",
    bucket_col: str = "event_timestamp",
) -> DataFrame:
    """Bucket ``ts_col`` to ``bucket`` granularity and aggregate per
    (keys..., bucket).

    ``aggs`` maps output-column-name -> (agg_name, value_col). The
    reference buckets with a date_format string idiom
    (``date_format(ts, 'yyyy-MM-dd HH:00:00')``,
    chicago_taxi_trips_hourly_gold.ipynb:73-77); we use the typed
    ``date_trunc`` equivalent — same bucketing, no string round-trip.
    """
    bucketed = df.withColumn(bucket_col, F.date_trunc(bucket, F.col(ts_col)))
    exprs: list[Column] = []
    for out_name, (agg_name, value_col) in aggs.items():
        if agg_name not in _AGGS:
            raise ValueError(f"unknown agg {agg_name!r}; have {sorted(_AGGS)}")
        exprs.append(_AGGS[agg_name](F.col(value_col)).alias(out_name))
    return bucketed.groupBy(*keys, bucket_col).agg(*exprs)


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    *,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key: ROW_NUMBER over (keys) ordered by order_cols
    DESC (then tie_breakers DESC), keep rank 1.

    This is the reference's J3/W1 latest-version dedup (CASE.MD:445-464)
    and the core of materialization. Window over keys = one shuffle; at
    scale prefer running it per partition-pruned time slice.
    """
    order = [F.col(c).desc() for c in list(order_cols) + list(tie_breakers)]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    state_col: str | Sequence[str],
    *,
    tie_breakers: Sequence[str] = (),
    out_state: str = "state",
    out_from: str = "valid_from",
    out_to: str = "valid_to",
    out_current: str = "is_current",
) -> DataFrame:
    """Collapse a per-key event stream into SCD Type-2 intervals:
    ``(keys..., <state column(s)>, valid_from, valid_to, is_current)``.

    ``state_col`` is one column (output aliased to ``out_state``) or a
    SEQUENCE of attribute columns — the usual dimension-table shape,
    where an interval closes when ANY attribute changes; multi-column
    states keep their own names in the output. Consecutive rows
    (ordered by ``ts_col`` then ``tie_breakers``) with the same state
    merge into one interval; ``valid_to`` is NULL and ``is_current``
    true for the open tail. The materialized form of the reference's
    latest-version semantics (CASE.MD:431-464): a PIT lookup against
    the output is a plain range predicate ``valid_from <= ts AND
    (valid_to IS NULL OR ts < valid_to)``.

    Scale shape: ONE shuffle on ``keys``; the change-point lag() and the
    interval-closing lead() stack on the same sort order, so Catalyst
    reuses the Exchange and the second Window only re-sorts the
    (smaller) change-point relation. Pass ``tie_breakers`` whenever
    ``ts_col`` can tie, or the collapse order is engine-dependent.
    """
    multi = not isinstance(state_col, str)
    state_cols = list(state_col) if multi else [state_col]
    # change detection compares the attribute TUPLE; struct equality is
    # null-safe per field in Spark, so a NULL attribute doesn't force a
    # spurious change point
    state_expr = F.struct(*state_cols) if multi else F.col(state_col)
    order = [F.col(ts_col)] + [F.col(c) for c in tie_breakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    # NULL-safe change predicate: `prev != state` evaluates to NULL for
    # an 'A' -> NULL transition (dropping the change point, so the prior
    # interval silently absorbs the NULL period) AND `prev IS NULL` fires
    # on the SECOND consecutive NULL state. eqNullSafe treats NULL as an
    # ordinary state value; an explicit first-row marker opens the first
    # interval even when its state is NULL. Both window functions stack
    # on the same (keys, order) frame — one Exchange, one Sort.
    changes = (
        df.withColumn("__prev_state", F.lag(state_expr).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col("__prev_state").eqNullSafe(state_expr)
        )
        .drop("__prev_state", "__rn")
    )
    out_states = (
        [F.col(c) for c in state_cols]
        if multi
        else [F.col(state_col).alias(out_state)]
    )
    return changes.select(
        *keys,
        *out_states,
        F.col(ts_col).alias(out_from),
        F.lead(ts_col).over(w).alias(out_to),
        F.lead(ts_col).over(w).isNull().alias(out_current),
    )


def scd2_lookup(
    intervals: DataFrame,
    probes: DataFrame,
    keys: Sequence[str],
    probe_ts_col: str,
    *,
    state_col: str | Sequence[str] = "state",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time state lookup against a materialized SCD2 table:
    each probe row gains the state column(s) whose interval contains
    its timestamp (``valid_from <= ts AND (valid_to IS NULL OR ts <
    valid_to)``), NULL when the probe predates every interval.
    ``state_col`` mirrors `scd2_intervals`: one column or the sequence
    of attribute columns of a multi-attribute dimension.

    This is WHY a feature store materializes `scd2_intervals`: the
    as-of join's window machinery collapses to an equi-join on the
    entity keys plus a range predicate — per key the interval set is
    tiny (one row per state CHANGE, not per event), so the join
    fan-out is bounded and each probe matches exactly one interval by
    the timeline-partition invariant. Left-preserving on probes.

    Measured honestly: at the bench's toy scale (sf0.1, state changes
    ~ events) the two lookup paths time at PARITY — the advantage is
    STRUCTURAL, proportional to the events-per-state-change ratio,
    and materializes when the interval table is orders of magnitude
    smaller than the event log (plus the table prunes by key/time
    where the as-of join must window the full stream).
    """
    state_cols = [state_col] if isinstance(state_col, str) else list(state_col)
    cols = [from_col, to_col, *state_cols]
    iv = intervals.select(
        *keys, *[F.col(c).alias(f"__scd2_{c}") for c in cols]
    )
    pf, pt = f"__scd2_{from_col}", f"__scd2_{to_col}"
    # range predicate INSIDE the left join: the equi part (entity keys)
    # drives the join strategy, the range conjunct filters matches, and
    # probes with no containing interval keep a NULL state row — no
    # post-hoc restore pass (which would mis-handle NULL probe columns)
    on = (iv[pf] <= probes[probe_ts_col]) & (
        iv[pt].isNull() | (probes[probe_ts_col] < iv[pt])
    )
    for k in keys:
        on = (probes[k] == iv[k]) & on
    return probes.join(iv, on, "left").select(
        *[probes[c] for c in probes.columns],
        *[iv[f"__scd2_{c}"].alias(c) for c in state_cols],
    )
