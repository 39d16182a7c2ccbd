"""KMV / HLL sketch tier (operators/sketches.py): estimator accuracy,
mergeability (the property exact count(DISTINCT) can never have), and
the engine-parity primitives (bin()-based rho, integer Z sum)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from my_feast_spark.operators.sketches import (
    HLL_SCALE_BITS,
    cms_build,
    cms_estimate,
    hll_alpha,
    hll_estimate,
    hll_group_distinct,
    hll_registers,
    kmv_sketch,
    kmv_union,
    sketch_hash,
)


def _keys_df(spark, n, prefix="key"):
    return spark.range(n).select(
        F.concat(F.lit(prefix + "-"), F.col("id").cast("string")).alias("v")
    )


def test_kmv_estimate_within_error_band(spark):
    """k=256 -> relative standard error ~1/sqrt(k) = 6.25%; assert a
    4-sigma band on a 20k-distinct input."""
    n, k = 20_000, 256
    sk = kmv_sketch(_keys_df(spark, n), "v", k).collect()
    assert len(sk) == k
    hs = [r["h"] for r in sk]
    assert hs == sorted(hs) and len(set(hs)) == k
    est = (k - 1) * 2.0**63 / hs[-1]
    assert abs(est - n) / n < 4 / math.sqrt(k)


def test_kmv_small_set_is_exact(spark):
    """Fewer distinct values than k: the sketch IS the distinct set."""
    sk = kmv_sketch(_keys_df(spark, 10), "v", 256).collect()
    assert len(sk) == 10


def test_kmv_union_equals_sketch_of_union(spark):
    """Mergeability: bottom-k of two sketches' union == the sketch of
    the concatenated input. Overlapping ranges exercise dedup."""
    k = 64
    a = _keys_df(spark, 500)                       # key-0..key-499
    b = spark.range(250, 900).select(              # key-250..key-899
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("v")
    )
    merged = kmv_union(
        [kmv_sketch(a, "v", k), kmv_sketch(b, "v", k)], k
    ).collect()
    direct = kmv_sketch(a.unionByName(b), "v", k).collect()
    assert [r["h"] for r in merged] == [r["h"] for r in direct]


def test_hll_registers_merge_by_max(spark):
    """Shard register tables merged with elementwise MAX equal the
    registers of the full input — the incremental-profile property."""
    full = _keys_df(spark, 5_000)
    s1 = full.where(F.expr("CAST(substr(v, 5) AS BIGINT) % 2 = 0"))
    s2 = full.where(F.expr("CAST(substr(v, 5) AS BIGINT) % 2 = 1"))
    r_full = {
        r["bucket"]: r["rho"]
        for r in hll_registers(full, "v", p=8).collect()
    }
    merged: dict[int, int] = {}
    for shard in (s1, s2):
        for r in hll_registers(shard, "v", p=8).collect():
            merged[r["bucket"]] = max(merged.get(r["bucket"], 0), r["rho"])
    assert merged == r_full


def test_hll_estimate_accuracy_and_linear_counting(spark):
    """m=256 -> ~6.5% std error; assert 4 sigma at 10k distinct. At 40
    distinct the small-range branch (linear counting) must engage and
    be nearly exact."""
    big = hll_group_distinct(
        _keys_df(spark, 10_000).withColumn("g", F.lit("g")), "v", ["g"], p=8
    ).collect()[0]
    assert abs(big["est_distinct"] - 10_000) / 10_000 < 4 * 1.04 / 16.0

    small = hll_group_distinct(
        _keys_df(spark, 40).withColumn("g", F.lit("g")), "v", ["g"], p=8
    ).collect()[0]
    assert small["n_zero"] > 0
    assert abs(small["est_distinct"] - 40) < 8  # linear counting regime


def test_hll_rho_zero_rest_edge(spark):
    """A hash whose post-bucket bits are all zero must land rho=W+1,
    not error — exercised with a crafted literal through the same
    expression path."""
    df = spark.createDataFrame([Row(bucket=3, rho=56)])  # W+1 for p=8
    row = hll_estimate(df, p=8).collect()[0]
    # rho > HLL_SCALE_BITS quantizes to zero contribution
    assert row["sum_scaled"] == 0
    assert row["n_zero"] == 255


def test_estimate_columns_are_stable_types(spark):
    out = hll_group_distinct(
        _keys_df(spark, 100).withColumn("g", F.lit("a")), "v", ["g"], p=8
    )
    kinds = dict(out.dtypes)
    assert kinds["n_zero"] == "bigint"
    assert kinds["sum_scaled"] == "bigint"
    assert kinds["est_distinct"] == "double"
    assert kinds["registers_md5"] == "string"


def test_alpha_constants():
    assert hll_alpha(16) == 0.673
    assert abs(hll_alpha(256) - 0.7213 / (1 + 1.079 / 256)) < 1e-15
    assert HLL_SCALE_BITS == 40


def test_kmv_plan_is_take_ordered(spark):
    """The bottom-k must be a TakeOrderedAndProject (per-partition
    partial top-k), never a global Sort — the scale contract."""
    plan = kmv_sketch(
        _keys_df(spark, 1000), "v", 64
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [h" not in plan


def _skewed_stream(spark, n_hot=500, n_tail=3_000):
    """A frequency stream: one hot key with n_hot occurrences plus a
    long tail of singletons."""
    hot = spark.range(n_hot).select(F.lit("hot-key").alias("v"))
    tail = spark.range(n_tail).select(
        F.concat(F.lit("tail-"), F.col("id").cast("string")).alias("v")
    )
    return hot.unionByName(tail)


def test_cms_never_underestimates_and_is_tight_for_heavy(spark):
    stream = _skewed_stream(spark)
    cms = cms_build(stream, "v", d=4, w=1024)
    keys = spark.createDataFrame(
        [Row(v="hot-key", exact=500), Row(v="tail-7", exact=1),
         Row(v="absent", exact=0)]
    )
    got = {
        r["v"]: r["est_count"]
        for r in cms_estimate(cms, keys, "v", d=4, w=1024).collect()
    }
    assert got["hot-key"] >= 500
    assert got["tail-7"] >= 1
    assert got["absent"] >= 0
    # error bound: eps = e/w per counter, over 3.5k increments -> the
    # min-of-d estimate stays within a few tail collisions
    assert got["hot-key"] <= 500 + 40
    assert got["tail-7"] <= 1 + 40


def test_cms_state_is_bounded_and_mergeable(spark):
    d, w = 4, 256
    full = _skewed_stream(spark)
    s1 = full.where(F.col("v") != "hot-key")
    s2 = full.where(F.col("v") == "hot-key")
    cms_full = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_build(full, "v", d=d, w=w).collect()
    }
    assert len(cms_full) <= d * w
    merged: dict[tuple, int] = {}
    for shard in (s1, s2):
        for r in cms_build(shard, "v", d=d, w=w).collect():
            k = (r["r"], r["c"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == cms_full


def test_cms_estimate_broadcasts_the_sketch(spark):
    stream = _skewed_stream(spark, n_hot=50, n_tail=200)
    cms = cms_build(stream, "v", d=4, w=256)
    keys = spark.createDataFrame([Row(v="hot-key")])
    plan = (
        cms_estimate(cms, keys, "v", d=4, w=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_xxhash64_family_same_estimator_quality(spark):
    """The scale-path family plugs into the same estimator: accuracy
    band holds, registers differ from the portable family's."""
    df = _keys_df(spark, 10_000).withColumn("g", F.lit("g"))
    a = hll_group_distinct(df, "v", ["g"], p=8)
    b = hll_group_distinct(df, "v", ["g"], p=8, hash_fn="xxhash64")
    ra, rb = a.collect()[0], b.collect()[0]
    assert abs(rb["est_distinct"] - 10_000) / 10_000 < 4 * 1.04 / 16.0
    assert ra["registers_md5"] != rb["registers_md5"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown hash_fn"):
        sketch_hash(F.lit("x"), "md5")


def test_hll_time_rollup_folds_registers_not_rows(spark):
    """Coarse periods folded from fine registers must equal a direct
    build at the coarse grain (register mergeability in time), and the
    estimates must track exact distincts within the sketch band."""
    import datetime as dt

    from my_feast_spark.operators.sketches import hll_time_rollup

    base = dt.datetime(2024, 1, 1)
    df = spark.range(40_000).select(
        (
            F.lit(base)
            + F.make_interval(hours=(F.col("id") % (24 * 28)).cast("int"))
        ).alias("ts"),
        # a user set that shifts over the month: day d sees users
        # [100*d, 100*d + 4000)
        F.concat(
            F.lit("u"),
            (
                (F.col("id") % 4000)
                + (F.col("id") % (24 * 28) / 24).cast("long") * 100
            ).cast("string"),
        ).alias("u"),
    )
    out = hll_time_rollup(df, "ts", "u", p=10, levels=("day", "month"))
    rows = out.collect()
    for c in getattr(out, "_owned_caches", ()):
        c.unpersist()
    days = [r for r in rows if r["granularity"] == "day"]
    months = [r for r in rows if r["granularity"] == "month"]
    assert len(days) == 28 and len(months) == 1

    # folded month == direct month registers (digest equality)
    from my_feast_spark.operators.sketches import (
        hll_group_distinct,
    )

    direct = hll_group_distinct(
        df.select(F.date_trunc("month", F.col("ts")).alias("g"), "u"),
        "u", ["g"], p=10,
    ).collect()[0]
    assert months[0]["registers_md5"] == direct["registers_md5"]
    assert months[0]["est_distinct"] == direct["est_distinct"]

    # accuracy vs EXACT distincts at both grains (4-sigma band, m=1024)
    exact = df.select("u").distinct().count()
    assert abs(months[0]["est_distinct"] - exact) / exact < 4 * 1.04 / 32.0
    exact_days = {
        r["d"]: r["n"]
        for r in df.groupBy(
            F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.countDistinct("u").alias("n")).collect()
    }
    for r in days:
        want = exact_days[r["period"]]
        assert abs(r["est_distinct"] - want) / want < 4 * 1.04 / 32.0


def test_hll_time_rollup_rejects_non_nesting_levels(spark):
    """Review-caught: folding WEEK registers into months misattributes
    whole straddling weeks — non-nesting level pairs must be rejected,
    nesting ones accepted."""
    import pytest as _pytest

    from my_feast_spark.operators.sketches import _validate_rollup_levels

    with _pytest.raises(ValueError, match="straddle"):
        _validate_rollup_levels(("week", "month"))
    with _pytest.raises(ValueError, match="does not nest"):
        _validate_rollup_levels(("month", "week"))
    with _pytest.raises(ValueError, match="does not nest"):
        _validate_rollup_levels(("month", "day"))  # coarse finer than fine
    # nesting pairs pass
    _validate_rollup_levels(("day", "week", "month"))
    _validate_rollup_levels(("hour", "day", "quarter", "year"))
    _validate_rollup_levels(("day", "day"))


def test_skew_report_finds_hot_keys_and_sizes_salt(spark):
    """A key holding ~25% of a 40k-row stream must surface with a
    tight never-underestimating count, a sane share, and a salt factor
    matching ceil(count / rows_per_task); uniform keys report salt 1."""
    from my_feast_spark.operators.sketches import skew_report

    hot = spark.range(10_000).select(
        F.col("id").alias("rid"), F.lit("hot").alias("k")
    )
    warm = spark.range(10_000, 13_000).select(
        F.col("id").alias("rid"), F.lit("warm").alias("k")
    )
    tail = spark.range(13_000, 40_000).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("t"), (F.col("id") % 900).cast("string")).alias("k"),
    )
    df = hot.unionByName(warm).unionByName(tail)
    rep = {
        r["key"]: r.asDict()
        for r in skew_report(
            df, "k", "rid", top=5, sample_mod=16, rows_per_task=4_000
        ).collect()
    }
    assert "hot" in rep and "warm" in rep
    assert 10_000 <= rep["hot"]["est_count"] <= 10_400
    assert abs(rep["hot"]["est_share"] - 0.25) < 0.02
    assert rep["hot"]["suggested_salt"] == -(-rep["hot"]["est_count"] // 4_000)
    assert rep["warm"]["suggested_salt"] == 1
    # tail keys (30 rows each) are below any skew concern
    for k, r in rep.items():
        if k.startswith("t"):
            assert r["suggested_salt"] == 1


def test_skew_report_is_deterministic(spark):
    from my_feast_spark.operators.sketches import skew_report

    df = spark.range(5_000).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("k"), (F.col("id") % 40).cast("string")).alias("k"),
    )
    a = [tuple(r) for r in skew_report(df, "k", "rid", top=3).collect()]
    b = [tuple(r) for r in skew_report(df, "k", "rid", top=3).collect()]
    assert a == b and len(a) == 3


def test_sketch_hash_is_portable_md5(spark):
    """Pin the hash family: sketch_hash must equal the 63-bit-masked
    md5_number_lower — the contract every SQL oracle replays."""
    import hashlib

    v = "parity-check"
    got = (
        spark.createDataFrame([Row(v=v)])
        .select(sketch_hash(F.col("v")).alias("h"))
        .collect()[0]["h"]
    )
    little = int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
    assert got == little & ((1 << 63) - 1)
