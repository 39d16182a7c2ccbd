"""Broadcast Bloom prefilter (operators/bloom.py): no false negatives,
bitmap == positions-join equivalence, plan shape (candidate side never
shuffled), and the literal-size guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_feast_spark.operators.bloom import (
    MAX_BITMAP_BITS,
    bloom_auto_geometry,
    bloom_bitmap,
    bloom_maybe_contains,
    bloom_maybe_from_bitmap,
    bloom_position_set,
    bloom_positions,
)

M, K = 1 << 14, 3


def _df(spark, lo, hi, name="v"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias(name)
    )


@pytest.fixture(scope="module")
def filt(spark):
    ref = _df(spark, 0, 2_000)
    pos = bloom_position_set(ref, "v", m_bits=M, k_hashes=K)
    bm = bloom_bitmap(ref, "v", m_bits=M, k_hashes=K)
    return pos, bm


def test_no_false_negatives(spark, filt):
    """Every true member must pass — the Bloom contract."""
    pos, _ = filt
    members = _df(spark, 0, 2_000)
    out = bloom_maybe_contains(members, pos, "v", m_bits=M, k_hashes=K)
    assert out.where(~F.col("bloom_maybe")).count() == 0


def test_false_positive_rate_in_band(spark, filt):
    """2k keys in 2^14 bits, k=3 -> theoretical FP ~ (1-e^-0.366)^3
    ~ 2.9%. Assert the measured rate on 8k non-members is < 3x that."""
    pos, _ = filt
    non_members = _df(spark, 10_000, 18_000)
    out = bloom_maybe_contains(non_members, pos, "v", m_bits=M, k_hashes=K)
    fp = out.where(F.col("bloom_maybe")).count()
    assert fp / 8_000 < 0.09
    assert fp > 0  # the band is real, not a degenerate all-false


def test_bitmap_equals_positions_join(spark, filt):
    pos, bm = filt
    probe = _df(spark, 1_500, 4_000)  # straddles the member boundary
    a = {
        r["v"]: r["bloom_maybe"]
        for r in bloom_maybe_contains(
            probe, pos, "v", m_bits=M, k_hashes=K
        ).collect()
    }
    b = {
        r["v"]: r["m2"]
        for r in probe.withColumn(
            "m2", bloom_maybe_from_bitmap("v", bm, m_bits=M, k_hashes=K)
        ).collect()
    }
    assert a == b


def test_bitmap_guard(spark):
    with pytest.raises(ValueError, match="bitmap-literal bound"):
        bloom_bitmap(
            _df(spark, 0, 1), "v", m_bits=MAX_BITMAP_BITS * 2, k_hashes=K
        )


def test_positions_deterministic_and_in_range(spark):
    rows = (
        _df(spark, 0, 100)
        .select(
            F.array(
                *bloom_positions(F.col("v"), m_bits=M, k_hashes=K)
            ).alias("p")
        )
        .collect()
    )
    for r in rows:
        assert len(r["p"]) == K
        assert all(0 <= p < M for p in r["p"])


def test_join_strategy_never_shuffles_candidates(spark, filt):
    """The candidate relation must reach every probe join without an
    exchange keyed on candidate rows: all K joins are broadcast, and
    the only Exchanges in the plan belong to the position-set build
    (distinct over the bounded position domain)."""
    pos, _ = filt
    cand = _df(spark, 0, 5_000)
    out = bloom_maybe_contains(cand, pos, "v", m_bits=M, k_hashes=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "pos" in line  # position-set distinct, never candidates


def test_xxhash64_family_round_trip(spark):
    """The scale-path hash family: build and probe with hash_fn=
    'xxhash64' — still no false negatives, and the verdicts differ from
    the portable family's bit pattern (different hashes, same
    semantics)."""
    ref = _df(spark, 0, 1_000)
    pos = bloom_position_set(
        ref, "v", m_bits=M, k_hashes=K, hash_fn="xxhash64"
    )
    members = bloom_maybe_contains(
        _df(spark, 0, 1_000), pos, "v", m_bits=M, k_hashes=K,
        hash_fn="xxhash64",
    )
    assert members.where(~F.col("bloom_maybe")).count() == 0


def test_auto_geometry_sizes_from_kmv(spark):
    """10 bits/key at ~20k keys -> m = 2^18 (the next pow2 over the KMV
    estimate), k ~ 7, and the resulting filter's FP rate lands in the
    designed ~0.8% band. Small inputs size exactly; empty is loud."""
    import pytest as _pytest

    ref = _df(spark, 0, 20_000)
    m, k = bloom_auto_geometry(ref, "v", bits_per_key=10)
    assert m == 1 << 18
    assert 5 <= k <= 9

    pos = bloom_position_set(ref, "v", m_bits=m, k_hashes=k)
    out = bloom_maybe_contains(
        _df(spark, 100_000, 110_000), pos, "v", m_bits=m, k_hashes=k
    )
    fp = out.where(F.col("bloom_maybe")).count()
    assert fp / 10_000 < 0.03

    m_small, k_small = bloom_auto_geometry(_df(spark, 0, 50), "v")
    assert m_small >= 500 and k_small >= 1

    assert bloom_auto_geometry(
        ref, "v", bits_per_key=10, max_bits=1 << 12
    )[0] == 1 << 12  # cap respected

    with _pytest.raises(ValueError, match="empty reference"):
        bloom_auto_geometry(_df(spark, 0, 0), "v")


def test_join_strategy_hashes_candidates_once_per_row(spark, filt):
    """The k join conditions must reference a PROJECTED hash attribute
    on the candidate side — ONE md5 per candidate row; inlining the
    chain re-evaluates it per probe (the projection-collapse trap,
    plan-counted at 40 nodes on the workload query before the fix).
    The k ref-side position-set builds each print an md5 subtree but
    canonicalize to one reused broadcast exchange at runtime."""
    pos, _ = filt
    out = bloom_maybe_contains(
        _df(spark, 0, 100), pos, "v", m_bits=M, k_hashes=K
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5(") <= 1 + K
    # candidate side: exactly one hash projection (aliased __bloom_h)
    # over the probe input
    cand_hashes = [
        ln for ln in plan.splitlines()
        if "md5(" in ln and "__bloom_h#" in ln
    ]
    assert len(cand_hashes) == 1


def test_bitmap_probe_is_pure_expression(spark, filt):
    """The packed-literal strategy must add NO join/exchange at all."""
    _, bm = filt
    out = _df(spark, 0, 100).withColumn(
        "m", bloom_maybe_from_bitmap("v", bm, m_bits=M, k_hashes=K)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_from_hashes_builders_match_keyed_builders(spark, filt):
    """The aggregate-first build path (r17): a bitmap / position set
    built from the precomputed distinct-hash relation must be
    bit-identical to the keyed build over the same key set — including
    when the hash relation collapses duplicate occurrences first (the
    workload query's distinct-grams-then-hash shape)."""
    from my_feast_spark.operators.bloom import (
        bloom_bitmap_from_hashes,
        bloom_position_set_from_hashes,
    )
    from my_feast_spark.operators.sketches import sketch_hash

    pos, bm = filt
    # duplicate occurrences: every key appears 3x, as an exploded
    # reference stream would carry it
    ref = _df(spark, 0, 2_000)
    dup = ref.union(ref).union(ref)
    hashes = (
        dup.select("v").distinct()
        .select(sketch_hash(F.col("v"), "portable").alias("hk"))
        .distinct()
    )
    bm2 = bloom_bitmap_from_hashes(hashes, "hk", m_bits=M, k_hashes=K)
    assert bm2 == bm
    pos2 = bloom_position_set_from_hashes(
        hashes, "hk", m_bits=M, k_hashes=K
    )
    assert pos2.exceptAll(pos).isEmpty() and pos.exceptAll(pos2).isEmpty()
