"""Property tests for the sketch/bloom tier: the invariants that hold
for EVERY input, not just the fixtures — bloom never false-negatives,
CMS never underestimates, KMV/HLL estimates stay inside their error
bands, and merges equal one-shot builds."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from my_feast_spark.operators.bloom import (
    bloom_bitmap,
    bloom_maybe_from_bitmap,
)
from my_feast_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_group_distinct,
    kmv_sketch,
    kmv_union,
)

_words = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=40,
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["v"])


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ref=_words, probe=_words)
def test_bloom_never_false_negative_any_input(spark, ref, probe):
    m, k = 1 << 10, 3
    bm = bloom_bitmap(_df(spark, ref), "v", m_bits=m, k_hashes=k)
    got = {
        r["v"]: r["m"]
        for r in _df(spark, set(ref) | set(probe)).withColumn(
            "m", bloom_maybe_from_bitmap("v", bm, m_bits=m, k_hashes=k)
        ).collect()
    }
    for v in set(ref):
        assert got[v], f"false negative for {v!r}"


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=_words)
def test_cms_never_underestimates_any_input(spark, values):
    d, w = 3, 64  # tiny w -> collisions guaranteed; the bound must hold
    df = _df(spark, values)
    cms = cms_build(df, "v", d=d, w=w)
    keys = _df(spark, set(values))
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(cms, keys, "v", d=d, w=w).collect()
    }
    from collections import Counter

    exact = Counter(values)
    for v, n in exact.items():
        assert est[v] >= n, f"underestimate for {v!r}: {est[v]} < {n}"


@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=300, max_value=4_000),
    split=st.integers(min_value=1, max_value=99),
)
def test_kmv_merge_and_band_any_split(spark, n, split):
    """Splitting the input anywhere: merged shard sketches equal the
    one-shot sketch, and the estimate stays inside 6 sigma."""
    k = 128
    full = spark.range(n).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v")
    )
    a = full.where(F.col("v").substr(2, 10).cast("long") % 100 < split)
    b = full.where(F.col("v").substr(2, 10).cast("long") % 100 >= split)
    merged = kmv_union([kmv_sketch(a, "v", k), kmv_sketch(b, "v", k)], k)
    direct = kmv_sketch(full, "v", k)
    ms = [r["h"] for r in merged.collect()]
    ds = [r["h"] for r in direct.collect()]
    assert ms == ds
    if len(ds) == k:
        est = (k - 1) * 2.0**63 / ds[-1]
        assert abs(est - n) / n < 6 / math.sqrt(k)
    else:
        assert len(ds) == n  # fewer distincts than k: sketch is exact


@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n=st.integers(min_value=1_000, max_value=8_000))
def test_hll_band_any_cardinality(spark, n):
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("y"), F.col("id").cast("string")).alias("v"),
    )
    est = hll_group_distinct(df, "v", ["g"], p=8).collect()[0][
        "est_distinct"
    ]
    assert abs(est - n) / n < 6 * 1.04 / 16.0
