"""Deterministic stratified sampling — the data-mixing primitive of a
training-data pipeline (up/down-weighting languages, sources, or quality
tiers to hit a target corpus mixture).

Unlike ``df.sample`` (seeded per-partition RNG: resplitting the input
changes the sample), the keep decision here is a pure function of the
row key: ``bucket(key) < rate * RESOLUTION`` with the bucket derived
from the portable md5 hash family (``operators/dedup.py``). That makes
the sample

  * reproducible across runs, executors, partition layouts, and engines
    (a DuckDB oracle replays it bit-for-bit via ``md5_number_lower``);
  * nested: the rows kept at rate 0.1 are a subset of those kept at 0.2,
    so mixture re-tuning only ever adds/removes the margin;
  * stratum-independent: a row's bucket ignores the rate table, so
    retuning one stratum never reshuffles another's sample.

Map-only at any scale — the filter is a per-row projection with no
shuffle, and it pushes below wide transforms like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from my_feast_spark.operators.dedup import _MASK63, portable_hash64

#: bucket resolution: rates are exact multiples of 1/RESOLUTION
RESOLUTION = 1_000_000


def sample_bucket(key: Column, *, salt: str = "strat") -> Column:
    """Deterministic bucket in [0, RESOLUTION) from the portable hash of
    ``key:salt``. Change ``salt`` to draw an independent sample (e.g.
    train/validation splits from the same keys)."""
    h = portable_hash64(F.concat(key.cast("string"), F.lit(":" + salt)))
    return F.pmod(h.bitwiseAND(F.lit(_MASK63)), F.lit(RESOLUTION))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by key.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata absent
    from the map use ``default_rate``. The comparison is integer
    (bucket < round(rate * RESOLUTION)) so engines never disagree on a
    float boundary.
    """
    for value, rate in {**rates, "<default_rate>": default_rate}.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(
                f"sampling rate for {value!r} must be in [0, 1], got {rate}"
            )
    threshold = F.lit(int(round(default_rate * RESOLUTION)))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(round(rate * RESOLUTION)))
        ).otherwise(threshold)
    return df.filter(sample_bucket(F.col(key_col), salt=salt) < threshold)


def ksample_per_stratum(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    *,
    salt: str = "ksample",
) -> DataFrame:
    """Deterministic fixed-SIZE sample: the k rows with the smallest
    portable-hash buckets per stratum (tie -> key order) — the
    "exactly k eval docs per language" primitive, where
    ``stratified_sample``'s fixed-RATE semantics can't promise a count.

    Like every sampler here the selection is a pure function of the
    key: re-runs and engines agree, and growing a stratum only ever
    displaces its current members from rank k downward (prefix-stable
    in the hash order, so refreshes churn minimally).

    Scale shape: ONE hash-exchange on the stratum + per-stratum sort
    (rank k is a row_number window, lowered to a running window — no
    global sort, no driver collection). Strata counts are typically
    modest (languages, sources); a stratum with billions of rows still
    sorts only within its partition group.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(stratum_col).orderBy(
        sample_bucket(F.col(key_col), salt=salt), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def shuffle_layout(
    df: DataFrame, key_col: str, *, n_shards: int = 8, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    ``shard_id`` and a dense in-shard ``shard_pos`` from the portable
    hash of ``key:salt`` — the "shuffle the corpus once, then stream
    shards sequentially" layout every epoch-ordered training run needs.

    Unlike ``df.orderBy(rand())`` the layout is a pure function of the
    key: re-runs, engine changes, and partition-layout changes all
    produce the SAME order, and changing ``salt`` draws an independent
    permutation (epoch reshuffle without rewriting the corpus logic).

    Scale shape: the hash/shard assignment is map-only; positions come
    from ONE row_number window partitioned by ``shard_id`` — a single
    hash-exchange on the shard key plus an in-shard sort, never a
    global total-order sort. ``n_shards`` should be sized so a shard is
    a write-bundle (hundreds at 100 TB), which also bounds each sort.
    Ties on the 63-bit hash are broken by the key itself, so the order
    is total and engine-independent.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col)
    h = portable_hash64(
        F.concat(key.cast("string"), F.lit(":" + salt))
    ).bitwiseAND(F.lit(_MASK63))
    shard = F.pmod(h, F.lit(n_shards)).cast("int")
    with_shard = df.withColumn("__h", h).withColumn("shard_id", shard)
    w = Window.partitionBy("shard_id").orderBy(F.col("__h"), key)
    return (
        with_shard.withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("__h")
    )


def score_weighted_sample(
    df: DataFrame,
    score_col: str,
    key_col: str,
    *,
    alpha: float = 9.0,
    salt: str = "pareto",
) -> DataFrame:
    """The GPT-3 quality-weighted keep rule, made deterministic.

    GPT-3 (Brown et al. 2020, Appendix A) keeps a crawl document when
    ``np.random.pareto(alpha) > 1 - score`` — high classifier scores
    keep (almost) surely, low scores survive with a heavy-tailed small
    probability, so the filtered corpus still covers the low-score
    mass instead of cliff-cutting it. Replayability demands no RNG:
    the Lomax tail gives P(pareto(a) > x) = (1 + x)^-a, so the rule is
    equivalent to keeping with probability ``(2 - s)^-alpha`` (s
    clamped to [0, 1]) — implemented as the deterministic comparison
    ``uniform_hash(key:salt) < keep_prob``. Pure expressions, map-only,
    stable across runs/engines/partitionings; change ``salt`` for an
    independent draw. Returns the surviving rows.
    """
    from my_feast_spark.functions.text import let

    s = F.least(F.greatest(F.col(score_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    # let-bind the base 2-s: the multiply tree references it 9 times
    # (alpha=9), and when Catalyst pushes this filter below the score
    # projection it substitutes the score's WHOLE expression per
    # reference — 9 tokenizations for the workload's composite score
    # without the binding (plan-pinned by test_text_queries_tokenize_once)
    keep_prob = let(
        F.lit(2.0) - s,
        lambda t: F.lit(1.0) / _pow_posint(t, alpha),
    )
    u = sample_bucket(F.col(key_col), salt=salt) / F.lit(float(RESOLUTION))
    return df.filter(u < keep_prob)


def _pow_posint(base: Column, n: float) -> Column:
    """``base ** n`` for a positive-integer exponent as an EXPLICIT
    square-and-multiply chain of IEEE multiplications instead of
    ``F.pow``: JVM ``Math.pow`` and the oracle engine's libm ``pow``
    are each only guaranteed within 1 ulp, so a last-ulp disagreement
    exactly at a keep-rule boundary can flip the keep SET between
    engines. Individual IEEE multiplies are exactly specified, so a
    fixed multiplication tree evaluates bit-identically on any IEEE
    engine — the oracle replays the same tree (see
    workload.SQL_SCORE_WEIGHTED_SAMPLE). Non-integer exponents have no
    such tree and refuse loudly rather than silently degrade."""
    k = int(n)
    if k != n or k < 1:
        raise ValueError(
            f"replayable pow needs a positive integer exponent, got {n}"
        )
    acc = None
    sq = base
    while k:
        if k & 1:
            acc = sq if acc is None else acc * sq
        k >>= 1
        if k:
            sq = sq * sq
    return acc
