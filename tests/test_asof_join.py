"""Golden tests for the point-in-time join (SURVEY §5.2 edge cases).

Hand-computed fixtures cover: inclusive <= boundary, created-timestamp
tie-break (late re-ingestion), probe-before-history NULLs, TTL expiry,
duplicate probe rows, entity passthrough columns, and strategy parity
(union_window vs range_join must agree).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from my_feast_spark.operators import point_in_time_join

TS = dt.datetime


def _features(spark):
    # entity_id, event_timestamp, created, value
    rows = [
        # plain history for e1
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 10), created=TS(2024, 1, 1, 10, 5), value=1.0),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 12), created=TS(2024, 1, 1, 12, 5), value=2.0),
        # late re-ingestion: same event ts, newer created, different value
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 12), created=TS(2024, 1, 1, 18, 0), value=22.0),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 14), created=TS(2024, 1, 1, 14, 5), value=3.0),
        # e2: history entirely after its probes
        Row(entity_id="e2", event_timestamp=TS(2024, 1, 5, 0), created=TS(2024, 1, 5, 0), value=9.0),
        # e3: old history (TTL case)
        Row(entity_id="e3", event_timestamp=TS(2024, 1, 1, 0), created=TS(2024, 1, 1, 0), value=7.0),
    ]
    return spark.createDataFrame(rows)


def _probes(spark):
    rows = [
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 12), tag="exact-boundary"),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 13), tag="between"),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 9), tag="before-history"),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 13), tag="dup-a"),
        Row(entity_id="e2", event_timestamp=TS(2024, 1, 1, 12), tag="no-history-yet"),
        Row(entity_id="e3", event_timestamp=TS(2024, 1, 10, 0), tag="ttl-expired"),
        Row(entity_id="e4", event_timestamp=TS(2024, 1, 1, 12), tag="unknown-entity"),
    ]
    return spark.createDataFrame(rows)


def _run(spark, strategy, ttl=None):
    out = point_in_time_join(
        _probes(spark),
        _features(spark),
        ["entity_id"],
        created_ts_col="created",
        ttl=ttl,
        strategy=strategy,
        # odd width so the golden fixtures straddle slice boundaries
        slice_interval=dt.timedelta(hours=5),
    )
    return {(r.entity_id, r.event_timestamp, r.tag): r.value for r in out.collect()}


@pytest.mark.parametrize(
    "strategy", ["union_window", "sliced_window", "range_join", "auto"]
)
def test_pit_semantics(spark, strategy):
    got = _run(spark, strategy)
    # inclusive boundary + created tie-break: probe at 12:00 sees the
    # late-re-ingested 22.0, not 2.0
    assert got[("e1", TS(2024, 1, 1, 12), "exact-boundary")] == 22.0
    # between 12 and 14 -> still the 12:00 (re-ingested) row
    assert got[("e1", TS(2024, 1, 1, 13), "between")] == 22.0
    assert got[("e1", TS(2024, 1, 1, 13), "dup-a")] == 22.0
    # probe before any history -> NULL (left-preserved)
    assert got[("e1", TS(2024, 1, 1, 9), "before-history")] is None
    # e2's history starts later -> NULL
    assert got[("e2", TS(2024, 1, 1, 12), "no-history-yet")] is None
    # unknown entity -> row preserved, NULL feature
    assert got[("e4", TS(2024, 1, 1, 12), "unknown-entity")] is None
    # without TTL, e3 sees its old row
    assert got[("e3", TS(2024, 1, 10, 0), "ttl-expired")] == 7.0
    assert len(got) == 7


@pytest.mark.parametrize(
    "strategy", ["union_window", "sliced_window", "range_join", "auto"]
)
def test_pit_ttl(spark, strategy):
    got = _run(spark, strategy, ttl=dt.timedelta(days=2))
    # e3's only row is 9 days before the probe -> TTL-expired -> NULL
    assert got[("e3", TS(2024, 1, 10, 0), "ttl-expired")] is None
    # fresh rows unaffected
    assert got[("e1", TS(2024, 1, 1, 13), "between")] == 22.0


def test_duplicate_probe_rows_preserved(spark):
    probes = spark.createDataFrame(
        [Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 13), tag="d")] * 3
    )
    out = point_in_time_join(
        probes, _features(spark), ["entity_id"], created_ts_col="created"
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.value == 22.0 for r in rows)


def test_full_feature_names_and_feature_ts(spark):
    out = point_in_time_join(
        _probes(spark), _features(spark), ["entity_id"],
        created_ts_col="created",
        feature_view_name="fv", full_feature_names=True, include_feature_ts=True,
    )
    assert "fv__value" in out.columns
    assert "fv__feature_event_timestamp" in out.columns
    row = {(r.entity_id, r.tag): r for r in out.collect()}
    assert row[("e1", "between")].fv__feature_event_timestamp == TS(2024, 1, 1, 12)


def test_null_feature_value_does_not_leak_older_row(spark):
    # A NULL in the winning feature row must stay NULL (struct payload
    # semantics), not fall back to an older non-null value.
    feats = spark.createDataFrame([
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 10), created=TS(2024, 1, 1, 10), value=1.0),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 12), created=TS(2024, 1, 1, 12), value=None),
    ])
    probes = spark.createDataFrame([Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 13))])
    out = point_in_time_join(probes, feats, ["entity_id"], created_ts_col="created",
                             include_feature_ts=True)
    r = out.collect()[0]
    assert r.value is None
    assert r.feature_event_timestamp == TS(2024, 1, 1, 12)


def test_collision_raises(spark):
    probes = _probes(spark).withColumnRenamed("tag", "value")
    with pytest.raises(ValueError, match="collide"):
        point_in_time_join(probes, _features(spark), ["entity_id"], created_ts_col="created")


def test_ttl_zero_means_no_expiry(spark):
    """Feast semantics: ttl=0 disables the lower bound (the reference's
    generated SQL omits it when ttl=0) — old features must still match."""
    import datetime as dt
    from pyspark.sql import Row
    from my_feast_spark.operators.asof_join import point_in_time_join

    feats = spark.createDataFrame([
        Row(k="a", fts=dt.datetime(2024, 1, 1), val=1.0),
    ])
    probes = spark.createDataFrame([
        Row(k="a", pts=dt.datetime(2024, 6, 1)),  # 5 months later
    ])
    for ttl in (dt.timedelta(0), 0, None):
        out = point_in_time_join(
            probes, feats, ["k"], event_ts_col="fts", entity_ts_col="pts",
            ttl=ttl, features=["val"],
        ).collect()
        assert out[0].val == 1.0, f"ttl={ttl!r} must not expire history"
    # and a REAL ttl still does
    out = point_in_time_join(
        probes, feats, ["k"], event_ts_col="fts", entity_ts_col="pts",
        ttl=dt.timedelta(days=2), features=["val"],
    ).collect()
    assert out[0].val is None


def test_composite_join_keys(spark):
    """Multi-column entity keys (Entity.join_keys can be several columns):
    matching must require ALL keys equal."""
    import datetime as dt
    from pyspark.sql import Row
    from my_feast_spark.operators.asof_join import point_in_time_join

    feats = spark.createDataFrame([
        Row(region="us", dev="ios", fts=dt.datetime(2024, 1, 1, 10), val=1.0),
        Row(region="us", dev="and", fts=dt.datetime(2024, 1, 1, 10), val=2.0),
        Row(region="eu", dev="ios", fts=dt.datetime(2024, 1, 1, 10), val=3.0),
    ])
    probes = spark.createDataFrame([
        Row(region="us", dev="ios", pts=dt.datetime(2024, 1, 1, 12)),
        Row(region="eu", dev="and", pts=dt.datetime(2024, 1, 1, 12)),  # no match
    ])
    for strategy in ("union_window", "sliced_window", "range_join"):
        out = {
            (r.region, r.dev): r.val
            for r in point_in_time_join(
                probes, feats, ["region", "dev"],
                event_ts_col="fts", entity_ts_col="pts",
                features=["val"], strategy=strategy,
            ).collect()
        }
        assert out == {("us", "ios"): 1.0, ("eu", "and"): None}

@pytest.mark.parametrize("strategy", ["union_window", "sliced_window", "range_join"])
def test_null_join_keys_never_match(spark, strategy):
    """SQL left-join semantics: a NULL key matches NOTHING — NULL-keyed
    probes pass through with NULL features even when NULL-keyed feature
    rows exist (Spark window partitioning would otherwise pair them)."""
    feats = spark.createDataFrame([
        Row(entity_id=None, event_timestamp=TS(2024, 1, 1, 10), created=TS(2024, 1, 1, 10), value=66.0),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 10), created=TS(2024, 1, 1, 10), value=1.0),
    ])
    probes = spark.createDataFrame([
        Row(entity_id=None, event_timestamp=TS(2024, 1, 1, 12), tag="null-key"),
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 1, 12), tag="real"),
    ])
    out = {
        r.tag: r.value
        for r in point_in_time_join(
            probes, feats, ["entity_id"], created_ts_col="created",
            strategy=strategy, slice_interval=dt.timedelta(hours=5),
        ).collect()
    }
    assert out == {"null-key": None, "real": 1.0}


def test_sliced_window_hot_key_boundary_carry(spark):
    """Deliberately hot key: every row on ONE entity, probes scattered so
    most slices have no in-slice history — the carry-in must supply the
    latest earlier-slice feature (incl. the created-ts tie-break winner)."""
    one_hour = dt.timedelta(hours=1)
    base = TS(2024, 1, 1, 0)
    feats = [
        Row(entity_id="hot", event_timestamp=base + 3 * one_hour,
            created=base + 3 * one_hour, value=1.0),
        # same event ts, later created — must win across slice boundaries
        Row(entity_id="hot", event_timestamp=base + 3 * one_hour,
            created=base + 9 * one_hour, value=2.0),
        Row(entity_id="hot", event_timestamp=base + 50 * one_hour,
            created=base + 50 * one_hour, value=3.0),
    ]
    probes = [
        Row(entity_id="hot", event_timestamp=base + n * one_hour, tag=f"p{n}")
        for n in (0, 3, 7, 23, 49, 50, 99)
    ]
    expected = {"p0": None, "p3": 2.0, "p7": 2.0, "p23": 2.0,
                "p49": 2.0, "p50": 3.0, "p99": 3.0}
    for slice_iv in (dt.timedelta(hours=2), dt.timedelta(days=1)):
        out = {
            r.tag: r.value
            for r in point_in_time_join(
                spark.createDataFrame(probes), spark.createDataFrame(feats),
                ["entity_id"], created_ts_col="created",
                strategy="sliced_window", slice_interval=slice_iv,
            ).collect()
        }
        assert out == expected, slice_iv


def test_sliced_window_rejects_subsecond_interval(spark):
    """slice_interval < 1s would int-truncate to 0 and divide the slice-id
    expression by zero — silently un-slicing the skew protection. Must
    raise instead."""
    feats = spark.createDataFrame([
        Row(entity_id="a", event_timestamp=TS(2024, 1, 1, 1), value=1.0)
    ])
    probes = spark.createDataFrame([
        Row(entity_id="a", event_timestamp=TS(2024, 1, 1, 2))
    ])
    for bad in (0.5, dt.timedelta(milliseconds=250), 0, -3):
        with pytest.raises(ValueError, match="slice_interval"):
            point_in_time_join(
                probes, feats, ["entity_id"],
                strategy="sliced_window", slice_interval=bad,
            )


def test_auto_strategy_probe_and_parity(spark):
    """strategy="auto" (_choose_strategy): uniform keys stay on
    union_window; a key hotter than hot_key_rows switches to
    sliced_window with a fitted slice interval, and the sliced result
    matches union_window exactly."""
    from my_feast_spark.operators.asof_join import _choose_strategy

    base = TS(2024, 1, 1)
    one_hour = dt.timedelta(hours=1)
    feats = [
        Row(entity_id="hot", event_timestamp=base + n * one_hour,
            created=base + n * one_hour, value=float(n))
        for n in range(100)
    ] + [
        Row(entity_id="cold", event_timestamp=base, created=base, value=-1.0)
    ]
    probes = [
        Row(entity_id="hot", event_timestamp=base + n * one_hour, tag=f"p{n}")
        for n in (0, 7, 50, 99)
    ] + [Row(entity_id="cold", event_timestamp=base + one_hour, tag="c")]
    fdf, pdf = spark.createDataFrame(feats), spark.createDataFrame(probes)

    # uniform regime: hottest key (104 rows) under the threshold; the
    # tiny probe side enables the history prefilter
    name, interval, prefilter = _choose_strategy(
        pdf, fdf, ["entity_id"], "event_timestamp", "event_timestamp", 1000
    )
    assert (name, interval, prefilter) == ("union_window", None, True)

    # hot regime: threshold of 25 rows -> sliced, fitted interval covers
    # the hot key's ~99h span in 2*ceil(104/25)=10 slices
    name, interval, _pf = _choose_strategy(
        pdf, fdf, ["entity_id"], "event_timestamp", "event_timestamp", 25
    )
    assert name == "sliced_window"
    assert dt.timedelta(seconds=1) <= interval <= dt.timedelta(hours=99)

    def run(**kw):
        return {
            r.tag: r.value
            for r in point_in_time_join(
                pdf, fdf, ["entity_id"], created_ts_col="created", **kw
            ).collect()
        }

    assert run(strategy="auto", hot_key_rows=25) == run(
        strategy="union_window"
    )


def test_auto_strategy_numeric_epoch_ts(spark):
    """strategy="auto" with a NUMERIC epoch-seconds event-ts column:
    the hot-key span probe must not assume datetime values (hi - lo is
    a plain number), and the fitted sliced_window run must match
    union_window (both bucket via cast-to-timestamp = epoch seconds)."""
    from my_feast_spark.operators.asof_join import _choose_strategy

    base = 1_700_000_000  # epoch seconds
    feats = [
        Row(entity_id="hot", event_timestamp=base + n * 3600,
            created=base + n * 3600, value=float(n))
        for n in range(100)
    ] + [
        Row(entity_id="cold", event_timestamp=base, created=base, value=-1.0)
    ]
    probes = [
        Row(entity_id="hot", event_timestamp=base + n * 3600, tag=f"p{n}")
        for n in (0, 7, 50, 99)
    ] + [Row(entity_id="cold", event_timestamp=base + 3600, tag="c")]
    fdf, pdf = spark.createDataFrame(feats), spark.createDataFrame(probes)

    name, interval, _pf = _choose_strategy(
        pdf, fdf, ["entity_id"], "event_timestamp", "event_timestamp", 25
    )
    assert name == "sliced_window"
    assert dt.timedelta(seconds=1) <= interval <= dt.timedelta(hours=99)

    def run(**kw):
        return {
            r.tag: r.value
            for r in point_in_time_join(
                pdf, fdf, ["entity_id"], created_ts_col="created", **kw
            ).collect()
        }

    assert run(strategy="auto", hot_key_rows=25) == run(
        strategy="union_window"
    ) == {"p0": 0.0, "p7": 7.0, "p50": 50.0, "p99": 99.0, "c": -1.0}


def test_auto_prefilter_threshold_and_parity(spark):
    """Above PREFILTER_PROBE_ROWS the prefilter stays off; with it
    forced on (monkeypatched threshold), results still match the plain
    union_window run — the semi-join is output-invariant."""
    import my_feast_spark.operators.asof_join as aj

    base = TS(2024, 1, 1)
    feats = spark.createDataFrame([
        Row(entity_id=f"e{i}", event_timestamp=base, created=base,
            value=float(i))
        for i in range(20)
    ])
    probes = spark.createDataFrame([
        Row(entity_id="e3", event_timestamp=base + dt.timedelta(hours=1),
            tag="a"),
        Row(entity_id="e7", event_timestamp=base + dt.timedelta(hours=2),
            tag="b"),
        Row(entity_id="missing", event_timestamp=base, tag="c"),
    ])
    _, _, pf = aj._choose_strategy(
        probes, feats, ["entity_id"], "event_timestamp", "event_timestamp",
        1000,
    )
    assert pf is True
    old = aj.PREFILTER_PROBE_ROWS
    try:
        aj.PREFILTER_PROBE_ROWS = 0  # force OFF (3 probes > 0)
        _, _, pf = aj._choose_strategy(
            probes, feats, ["entity_id"], "event_timestamp",
            "event_timestamp", 1000,
        )
        assert pf is False
    finally:
        aj.PREFILTER_PROBE_ROWS = old

    def run(**kw):
        return sorted(
            (r.tag, r.value)
            for r in point_in_time_join(
                probes, feats, ["entity_id"], created_ts_col="created", **kw
            ).collect()
        )

    assert run(strategy="auto") == run(strategy="union_window") == [
        ("a", 3.0), ("b", 7.0), ("c", None)
    ]


def test_auto_prefilter_plan_is_broadcast_semi_join(spark):
    """The small-probe history prefilter must be a BROADCAST semi-join
    (no shuffle of the history for the key filter) — the property that
    makes it free at 100 TB."""
    feats = spark.createDataFrame([
        Row(entity_id=f"e{i}", event_timestamp=TS(2024, 1, 1), created=TS(2024, 1, 1), value=float(i))
        for i in range(10)
    ])
    probes = spark.createDataFrame([
        Row(entity_id="e1", event_timestamp=TS(2024, 1, 2), tag="t")
    ])
    out = point_in_time_join(
        probes, feats, ["entity_id"], created_ts_col="created",
        strategy="auto",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
