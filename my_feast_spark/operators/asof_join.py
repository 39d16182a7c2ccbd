"""Point-in-time (as-of) join — the engine's flagship operator.

Semantics match the reference's generated retrieval SQL (the 4-stage CTE
pipeline printed at CASE.MD:339-502 / Untitled.ipynb:698-860):

  * for every entity row (join_keys..., entity event_timestamp) attach the
    feature row with the greatest feature event_timestamp <= entity
    timestamp (inclusive boundary, CASE.MD:415);
  * ties on feature event_timestamp are broken by greatest
    created_timestamp — "late re-ingestion wins" (CASE.MD:431-438,453-456);
  * an optional TTL discards features older than entity_ts - ttl
    (CASE.MD:385-386);
  * the entity dataframe is left-preserved: entities with no qualifying
    history get NULL features (CASE.MD:486-501);
  * duplicate entity rows are preserved in the output (the reference dedups
    for the join and re-expands via its row_unique_id; net effect is
    identical).

Implementation — scale-first
----------------------------
The reference executes this as an *inequality join* (feature.ts <=
entity.ts AND feature.key = entity.key) followed by a ROW_NUMBER window.
On Spark that inequality conjunct degrades the join to
O(|entities_per_key| x |history_per_key|) work per key before the window
throws most of it away — fine at demo scale, catastrophic at 100 TB.

Default strategy here is ``union_window`` ("last observation carried
forward"): tag feature rows and entity rows, union them, and run a single
``last(payload, ignorenulls=True)`` window per join key ordered by
(timestamp, is_entity, created). Cost: ONE shuffle of (features + probes)
on the join key + a sort within partitions — linear, no quadratic blowup,
and the created-timestamp tie-break falls out of the sort order for free
(among equal timestamps the last-sorted feature row has the max created).
Feature payloads ride in a single struct so NULL feature values do not
leak older rows' values (per-column LOCF would).

``range_join`` (the reference's literal plan: non-equi join + window
top-1) is kept for small entity dataframes where Catalyst broadcasts the
probe side — useful when |probes| << |history| and history is huge but
per-key fan-out is small.

``sliced_window`` is the skew-hardened variant of ``union_window``: the
window partitions by (key, coarse time slice) instead of key alone, so a
pathologically hot key (millions of rows on ONE key — AQE cannot split a
window partition the way it splits a skewed join) spreads over
|slices| tasks. Correctness across slice boundaries comes from
boundary-carry rows: the latest feature row of every earlier slice is
pre-reduced per (key, slice) — a relation of at most |keys|×|slices|
rows — and injected into each probe-bearing slice as its carry-in.
Results are identical to ``union_window`` (asserted by golden + property
tests); cost is one extra small shuffle of the per-slice-latest relation.

``auto`` probes the per-key load (one column-pruned pass + a
metadata-sized shuffle, see ``_choose_strategy``) and picks
union_window below the hot-key threshold, sliced_window with a fitted
slice width above it — so a 100 TB retrieval with an unknown skew
profile no longer needs hand-tuning to avoid the one-task window sort.
The same pass counts the probe side: a broadcast-small probe set (a
backfill of a few entities against the full history) additionally
pre-filters history by a broadcast semi-join on the probe keys, so the
window shuffles only the asked-for keys' rows — the regime where the
reference's range_join looked attractive, served without its pair
blow-up.

NULL join keys follow SQL left-join semantics in every strategy: a NULL
key never matches anything (probe rows with a NULL key pass through with
NULL features; feature rows with a NULL key are dropped) — Spark window
partitioning would otherwise group NULLs together and diverge from the
reference's generated SQL.
"""

from __future__ import annotations

import datetime as _dt
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__mfs_ts"
_IS_PROBE = "__mfs_is_probe"
_CREATED = "__mfs_created"
_PAYLOAD = "__mfs_payload"
_FEAT_TS = "__mfs_feat_ts"
_ROW_ID = "__mfs_row_id"


def _ttl_seconds(ttl) -> float | None:
    """Feast semantics: ttl=0 (or timedelta(0)) means NO expiry — the
    reference's generated SQL elides the TTL lower bound entirely when
    ttl=0 (CASE.MD:385-386 describes the bound; the captured query at
    Untitled.ipynb:766-782 omits it because ttl was 0)."""
    if ttl is None:
        return None
    seconds = ttl.total_seconds() if isinstance(ttl, _dt.timedelta) else float(ttl)
    return seconds if seconds > 0 else None


def point_in_time_join(
    entity_df: DataFrame,
    feature_df: DataFrame,
    join_keys: Sequence[str],
    *,
    event_ts_col: str = "event_timestamp",
    entity_ts_col: str | None = None,
    created_ts_col: str | None = None,
    ttl=None,
    features: Sequence[str] | None = None,
    feature_view_name: str | None = None,
    full_feature_names: bool = False,
    include_feature_ts: bool = False,
    strategy: str = "union_window",
    slice_interval=_dt.timedelta(days=1),
    hot_key_rows: int = 1_000_000,
) -> DataFrame:
    """As-of join ``entity_df`` against ``feature_df``.

    Parameters
    ----------
    entity_df : probe rows — ``join_keys`` + ``entity_ts_col`` + arbitrary
        passthrough columns (all preserved).
    feature_df : history — ``join_keys`` + ``event_ts_col`` +
        optional ``created_ts_col`` + feature columns.
    ttl : ``datetime.timedelta`` or seconds; features strictly older than
        ``entity_ts - ttl`` are discarded (NULLed), matching the
        reference's TTL lower bound.
    features : feature columns to attach; default = all non-key,
        non-timestamp columns of ``feature_df``.
    full_feature_names : prefix output features ``<view>__<feature>``
        (the reference's ``full_feature_names=True`` retrieval mode).
    include_feature_ts : also emit ``<prefix>event_timestamp`` of the
        matched feature row (handy for debugging/tests).
    strategy : "union_window" (default, linear), "sliced_window" (hot-key
        safe; see module docstring), "range_join" (the reference's
        literal non-equi plan), or "auto" — probe the key distribution
        and pick union_window vs sliced_window (with a fitted
        slice_interval) per :func:`_choose_strategy`; a probe side under
        ``PREFILTER_PROBE_ROWS`` also pre-filters history by a broadcast
        semi-join on the probe keys (output-invariant — the join is
        probe-left-preserved). The probe costs one column-pruned pass
        over the two key+timestamp projections (parquet reads only those
        columns) and a metadata-sized shuffle; spend it when the skew
        profile is unknown, skip it (pick the strategy yourself) when it
        is.
    slice_interval : slice width for ``sliced_window`` — seconds or a
        ``datetime.timedelta`` (default 1 day). Pick it so a hot key's
        rows per slice fit one task comfortably; the carry relation costs
        |keys|×|slices| rows. Ignored by ``auto`` (which fits its own).
    hot_key_rows : ``auto`` only — switch to sliced_window when the
        hottest key carries more than this many feature+probe rows (the
        point where one task's window sort becomes the straggler;
        default 1M — the r9 probe measured sliced 1.9x faster than
        union_window at 2.5M rows on one key).
    """
    entity_ts_col = entity_ts_col or event_ts_col
    join_keys = list(join_keys)
    if not join_keys:
        raise ValueError("point_in_time_join requires at least one join key")

    if features is None:
        skip = set(join_keys) | {event_ts_col, created_ts_col}
        features = [c for c in feature_df.columns if c not in skip]
    features = list(features)

    prefix = f"{feature_view_name}__" if (full_feature_names and feature_view_name) else ""
    out_names = {f: prefix + f for f in features}
    entity_cols = [c for c in entity_df.columns]
    collisions = set(out_names.values()) & set(entity_cols)
    if collisions:
        raise ValueError(
            f"feature output columns collide with entity columns: {sorted(collisions)}; "
            "pass full_feature_names=True with a feature_view_name"
        )

    if strategy == "auto":
        strategy, slice_interval, prefilter = _choose_strategy(
            entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
            hot_key_rows,
        )
        if prefilter:
            # Small-probe regime (backfill of a few entities against a
            # huge history): drop history for keys no probe asks about
            # BEFORE the window shuffle, via a broadcast semi-join on
            # the distinct probe keys (≤ probe rows — broadcast-safe
            # by the auto threshold). Output-invariant: the join is
            # probe-left-preserved, so unprobed keys' history can never
            # reach it; what changes is the shuffle volume — only the
            # matching keys' history moves instead of the whole table.
            entity_keys = entity_df.select(*join_keys).distinct()
            feature_df = feature_df.join(
                F.broadcast(entity_keys), join_keys, "left_semi"
            )

    if strategy == "union_window":
        out = _union_window(
            entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
            created_ts_col, _ttl_seconds(ttl), features,
        )
    elif strategy == "sliced_window":
        out = _sliced_window(
            entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
            created_ts_col, _ttl_seconds(ttl), features,
            _slice_seconds(slice_interval),
        )
    elif strategy == "range_join":
        out = _range_join(
            entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
            created_ts_col, _ttl_seconds(ttl), features,
        )
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")

    # Unpack payload struct -> named feature columns (cast-free).
    sel = [F.col(c) for c in entity_cols]
    for f in features:
        sel.append(F.col(f"{_PAYLOAD}.{f}").alias(out_names[f]))
    if include_feature_ts:
        sel.append(F.col(f"{_PAYLOAD}.{_FEAT_TS}").alias(prefix + "feature_event_timestamp"))
    return out.select(*sel)


#: auto only: pre-filter history by a broadcast semi-join on the probe
#: keys when the probe side has at most this many rows. 1M distinct
#: long keys broadcast at ~8 MB; widen/narrow per deployment.
PREFILTER_PROBE_ROWS = 1_000_000


def _choose_strategy(
    entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
    hot_key_rows: int,
):
    """Pick union_window vs sliced_window (and the small-probe history
    pre-filter) from the key distribution.

    One aggregation over the key+timestamp projections of BOTH sides
    (the window's actual partition load is features + probes per key):
    per-key row counts with map-side combine, then the hottest key's
    (count, time span) and the global probe-row count — a single
    collected row, never data-sized. On parquet the probe scan is
    column-pruned to the key and timestamp columns, so its cost is a
    small fraction of the join it steers.

    Decisions, returned as (strategy, slice_interval, prefilter):

    * hottest key <= ``hot_key_rows`` → union_window (one shuffle, no
      carry overhead — the fast path the r9 probes measured 31x over
      range_join on uniform keys). Above it → sliced_window with
      ``slice_interval`` fitted so the hottest key spreads over
      ``2 * ceil(max_n / hot_key_rows)`` slices (each slice then holds
      at most ~hot_key_rows / 2 of its rows), clamped to >= 1 second.
    * probe rows <= ``PREFILTER_PROBE_ROWS`` → prefilter=True: the
      caller semi-joins history to the broadcast probe keys before the
      window, so a small backfill against a huge history shuffles only
      the asked-for keys' rows instead of the whole table.

    range_join is never auto-chosen: its regime (tiny probe set AND
    tiny per-key fan-out) is dominated by union_window + the prefilter,
    which avoids the non-equi pair blow-up entirely.
    """
    both = feature_df.select(
        *[F.col(k) for k in join_keys],
        F.col(event_ts_col).alias(_TS),
        F.lit(0).alias("__p"),
    ).unionByName(
        entity_df.select(
            *[F.col(k) for k in join_keys],
            F.col(entity_ts_col).alias(_TS),
            F.lit(1).alias("__p"),
        )
    )
    per_key = both.groupBy(*join_keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__p").alias("__np"),
        F.min(_TS).alias("__lo"),
        F.max(_TS).alias("__hi"),
    )
    row = per_key.agg(
        F.max("__n").alias("max_n"),
        F.sum("__np").alias("probe_rows"),
        F.max_by(F.struct("__lo", "__hi"), "__n").alias("hot_span"),
    ).collect()[0]
    max_n = row["max_n"] or 0
    prefilter = (row["probe_rows"] or 0) <= PREFILTER_PROBE_ROWS
    if max_n <= hot_key_rows:
        return "union_window", None, prefilter
    lo, hi = row["hot_span"]["__lo"], row["hot_span"]["__hi"]
    if lo is not None and hi is not None:
        # datetime/date pairs subtract to a timedelta; numeric epoch-
        # seconds columns (which union/sliced handle via cast to
        # timestamp = epoch seconds) subtract to a plain number already
        # in seconds — don't assume .total_seconds() exists.
        delta = hi - lo
        span_s = max(
            delta.total_seconds()
            if hasattr(delta, "total_seconds") else float(delta),
            1.0,
        )
    else:
        span_s = 1.0
    n_slices = 2 * -(-max_n // hot_key_rows)  # 2 * ceil
    return "sliced_window", _dt.timedelta(
        seconds=max(1, int(span_s // n_slices))
    ), prefilter


def _payload_struct(feature_df, features, event_ts_col):
    return F.struct(
        *[F.col(f) for f in features],
        F.col(event_ts_col).alias(_FEAT_TS),
    )


def _apply_ttl(df: DataFrame, entity_ts_col: str, ttl_s: float | None) -> DataFrame:
    """NULL the payload when the matched feature is older than the TTL."""
    if ttl_s is None:
        return df
    keep = F.col(f"{_PAYLOAD}.{_FEAT_TS}") >= (
        F.col(entity_ts_col) - F.expr(f"INTERVAL {int(ttl_s)} SECOND")
    )
    return df.withColumn(
        _PAYLOAD, F.when(keep, F.col(_PAYLOAD)).otherwise(F.lit(None))
    )


def _prune_history(feature_df, entity_df, event_ts_col, entity_ts_col):
    """The reference's upper-bound optimization (CASE.MD:403): feature
    rows newer than the newest probe can never match — filter them at the
    scan. Expressed as a broadcast of the 1-row max-probe-ts aggregate, so
    it stays in-plan (no driver action) and Catalyst pushes the resulting
    predicate into the join's input."""
    max_ts = entity_df.select(
        F.max(entity_ts_col).alias("__mfs_max_probe_ts")
    )
    return (
        feature_df.join(F.broadcast(max_ts))
        .filter(F.col(event_ts_col) <= F.col("__mfs_max_probe_ts"))
        .drop("__mfs_max_probe_ts")
    )


def _slice_seconds(slice_interval) -> int:
    s = (
        slice_interval.total_seconds()
        if isinstance(slice_interval, _dt.timedelta)
        else float(slice_interval)
    )
    # sub-second intervals would truncate to 0 and divide the slice-id
    # expression by zero, silently disabling the skew protection
    if int(s) < 1:
        raise ValueError(
            f"slice_interval must be >= 1 second, got {slice_interval!r}"
        )
    return int(s)


def _any_null_key(join_keys):
    cond = F.lit(False)
    for k in join_keys:
        cond = cond | F.col(k).isNull()
    return cond


def _split_null_keys(entity_df, feature_df, join_keys):
    """SQL left-join NULL semantics: NULL-keyed probes bypass the match
    (NULL features attached later); NULL-keyed feature rows are dropped —
    Spark's window partitioning would otherwise co-group NULLs and match
    them against each other, diverging from the reference's SQL."""
    any_null = _any_null_key(join_keys)
    return (
        entity_df.filter(~any_null),
        entity_df.filter(any_null),
        feature_df.filter(~any_null),
    )


def _union_sides(
    entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
    created_ts_col, features,
):
    """Tagged (feature ∪ probe) relation + the NULL-keyed probe remainder."""
    entity_ok, entity_null, feature_df = _split_null_keys(
        entity_df, feature_df, join_keys
    )
    feature_df = _prune_history(feature_df, entity_ok, event_ts_col, entity_ts_col)
    entity_payload_cols = [
        c for c in entity_df.columns if c not in join_keys and c != entity_ts_col
    ]

    created = (
        F.col(created_ts_col) if created_ts_col else F.lit(None).cast("timestamp")
    )
    feat_side = feature_df.select(
        *[F.col(k) for k in join_keys],
        F.col(event_ts_col).alias(_TS),
        F.lit(0).alias(_IS_PROBE),
        created.alias(_CREATED),
        _payload_struct(feature_df, features, event_ts_col).alias(_PAYLOAD),
        *[F.lit(None).cast(entity_df.schema[c].dataType).alias(c) for c in entity_payload_cols],
    )

    def probe_shape(df):
        return df.select(
            *[F.col(k) for k in join_keys],
            F.col(entity_ts_col).alias(_TS),
            F.lit(1).alias(_IS_PROBE),
            # match the feature side's created type exactly — numeric
            # epoch created columns are legal (same contract as _TS)
            F.lit(None).cast(feat_side.schema[_CREATED].dataType)
            .alias(_CREATED),
            F.lit(None).cast(feat_side.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
            *[F.col(c) for c in entity_payload_cols],
        )

    return feat_side, probe_shape(entity_ok), probe_shape(entity_null)


def _window_order():
    # Feature rows sort BEFORE probe rows at equal timestamps => the `<=`
    # boundary is inclusive; (ts asc, created asc) ordering makes "last
    # non-null payload" = max event_ts then max created — J2+J3 in one sort.
    # The PAYLOAD struct is the FINAL tie-breaker (Hypothesis-caught):
    # two feature rows identical in (key, ts, created) but different in
    # value would otherwise resolve by partition order — a different
    # winner per plan/strategy/retry, i.e. non-reproducible training
    # sets. With the payload in the total order the greatest struct
    # wins everywhere (arbitrary but deterministic; all three
    # strategies share the rule).
    return (
        F.col(_TS).asc(),
        F.col(_IS_PROBE).asc(),
        F.col(_CREATED).asc(),
        F.col(_PAYLOAD).asc_nulls_first(),
    )


def _union_window(
    entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
    created_ts_col, ttl_s, features,
):
    feat_side, probe_side, probe_null = _union_sides(
        entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
        created_ts_col, features,
    )
    unioned = feat_side.unionByName(probe_side)
    w = (
        Window.partitionBy(*join_keys)
        .orderBy(*_window_order())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    probes = (
        carried.filter(F.col(_IS_PROBE) == 1)
        .unionByName(probe_null)
        .withColumnRenamed(_TS, entity_ts_col)
    )
    probes = _apply_ttl(probes, entity_ts_col, ttl_s)
    return probes


def _sliced_window(
    entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
    created_ts_col, ttl_s, features, slice_s: int,
):
    """union_window partitioned by (key, time slice) with boundary-carry.

    Window state per task is bounded by rows-per-slice instead of
    rows-per-key — the hot-key mitigation sketched in the module
    docstring. Three relations meet in the final window:

      * in-slice feature rows and probe rows (slice = ts div slice_s);
      * one carry-in row per probe-bearing (key, slice): the latest
        feature row from ANY earlier slice, pre-reduced per (key, slice)
        and selected with a running window over the tiny per-slice-latest
        relation (|keys|×|slices| rows, NOT data-sized).

    The carry-in keeps its true feature timestamp (it sorts first within
    the slice, and TTL still sees the real age)."""
    feat_side, probe_side, probe_null = _union_sides(
        entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
        created_ts_col, features,
    )
    slice_us = int(slice_s) * 1_000_000
    slice_col = F.floor(
        F.unix_micros(F.col(_TS).cast("timestamp")) / F.lit(slice_us)
    ).cast("long")
    feat_side = feat_side.withColumn("__slice", slice_col)
    probe_side = probe_side.withColumn("__slice", slice_col)

    # latest feature row per (key, slice) — the boundary-carry candidates
    w_latest = Window.partitionBy(*join_keys, "__slice").orderBy(
        F.col(_TS).desc(), F.col(_CREATED).desc_nulls_last(),
        F.col(_PAYLOAD).desc_nulls_last(),  # same full-tie rule as
    )                                       # _window_order()
    slice_latest = (
        feat_side.withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Carry-in for probe slice s = latest per-slice-latest row with slice
    # strictly < s: union NULL-payload marker rows (one per distinct probe
    # (key, slice)) with the per-slice-latest rows, order markers BEFORE
    # the same slice's feature row, and take the running last non-null
    # payload over (unbounded, -1). Both relations are |keys|×|slices|-
    # sized — one small shuffle, never data-sized.
    non_key_cols = [
        c for c in slice_latest.columns if c not in (*join_keys, "__slice")
    ]
    markers = probe_side.select(*join_keys, "__slice").distinct().select(
        *join_keys, "__slice",
        *[
            F.lit(None).cast(slice_latest.schema[c].dataType).alias(c)
            for c in non_key_cols
        ],
    ).withColumn("__marker", F.lit(1))
    tagged = slice_latest.withColumn("__marker", F.lit(0)).unionByName(markers)
    w_carry = (
        Window.partitionBy(*join_keys)
        .orderBy(F.col("__slice").asc(), F.col("__marker").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        tagged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w_carry))
        .filter((F.col("__marker") == 1) & F.col(_PAYLOAD).isNotNull())
        # true feature timestamp: sorts before every in-slice row (it is
        # from an earlier slice) and keeps TTL age exact
        .withColumn(_TS, F.col(f"{_PAYLOAD}.{_FEAT_TS}"))
        .withColumn(_IS_PROBE, F.lit(0))
        .drop("__marker")
    )

    unioned = (
        feat_side.unionByName(probe_side)
        .unionByName(carry_in.select(*feat_side.columns))
    )
    w = (
        Window.partitionBy(*join_keys, "__slice")
        .orderBy(*_window_order())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    probes = (
        carried.filter(F.col(_IS_PROBE) == 1)
        .drop("__slice")
        .unionByName(probe_null)
        .withColumnRenamed(_TS, entity_ts_col)
    )
    return _apply_ttl(probes, entity_ts_col, ttl_s)


def _range_join(
    entity_df, feature_df, join_keys, event_ts_col, entity_ts_col,
    created_ts_col, ttl_s, features,
):
    """The reference's literal plan: non-equi join + ROW_NUMBER top-1.

    Left-preserved via LEFT join; the window then keeps the best candidate
    per original entity row (surrogate monotonic id — the reference's
    CONCAT(keys, ts) row id is only consumed for uniqueness, CASE.MD:345-357).
    """
    feature_df = _prune_history(feature_df, entity_df, event_ts_col, entity_ts_col)
    e = entity_df.withColumn(_ROW_ID, F.monotonically_increasing_id())
    created = (
        F.col(created_ts_col) if created_ts_col else F.lit(None).cast("timestamp")
    )
    f = feature_df.select(
        *[F.col(k).alias(f"__f_{k}") for k in join_keys],
        F.col(event_ts_col).alias(_TS),
        created.alias(_CREATED),
        _payload_struct(feature_df, features, event_ts_col).alias(_PAYLOAD),
    )
    cond = F.lit(True)
    for k in join_keys:
        cond = cond & (F.col(f"__f_{k}") == F.col(k))
    cond = cond & (F.col(_TS) <= F.col(entity_ts_col))
    if ttl_s is not None:
        cond = cond & (
            F.col(_TS) >= F.col(entity_ts_col) - F.expr(f"INTERVAL {int(ttl_s)} SECOND")
        )
    joined = e.join(f, on=cond, how="left")
    w = Window.partitionBy(_ROW_ID).orderBy(
        F.col(_TS).desc_nulls_last(), F.col(_CREATED).desc_nulls_last(),
        F.col(_PAYLOAD).desc_nulls_last(),  # full-tie rule, see
    )                                       # _window_order()
    best = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _TS, _CREATED, _ROW_ID, *[f"__f_{k}" for k in join_keys])
    )
    return best
