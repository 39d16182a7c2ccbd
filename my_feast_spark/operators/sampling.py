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

from pyspark.sql import Column, DataFrame, functions as F

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
