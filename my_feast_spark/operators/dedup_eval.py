"""Dedup-quality evaluation: measure LSH recall on a corpus sample.

Banded MinHash-LSH trades recall for never going all-pairs: its capture
probability at the Jaccard threshold is a formula (1-(1-j^r)^b), not a
guarantee about YOUR corpus — near-threshold pairs and hot-bucket caps
both cost recall in data-dependent ways. The production practice is to
measure: draw a deterministic sample small enough that EXACT Jaccard
pairing is affordable, run the same LSH configuration on it, and report
recall before trusting the config on the full corpus.

Scale shape: everything downstream of the sample filter is bounded by
the sample size (the exact shingle self-join is quadratic-ish per
shingle bucket — that is exactly why it only ever runs on the sample);
the two pair sets join on (doc_a, doc_b) and reduce to a 1-row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_feast_spark.functions.scalar import floor_round
from my_feast_spark.operators.dedup import jaccard_dup_pairs, minhash_lsh_dup_pairs
from my_feast_spark.operators.sampling import RESOLUTION, sample_bucket


def lsh_recall_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sample_rate: float = 0.1,
    salt: str = "lsh-eval",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 50,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """1-row report: LSH recall vs exact Jaccard on a hash sample.

    Columns: ``sample_docs``, ``truth_pairs`` (exact Jaccard >=
    threshold on the sample), ``lsh_pairs`` (same-config LSH on the
    sample), ``matched`` (intersection), ``recall`` (matched/truth,
    NULL when the sample has no duplicate pairs — widen the sample),
    ``precision`` (LSH verifies candidates with exact Jaccard, so
    anything below 1.0 is a bug, asserted in tests).

    The sample is the deterministic hash slice used everywhere else in
    the engine (``sampling.sample_bucket``) — re-running with the same
    salt evaluates the same docs, so config A/B comparisons are paired.
    """
    # int(round()) like sampling.stratified_sample — plain int() would
    # truncate rates that aren't exactly representable (0.29 * 1e6 ->
    # 289999.99…) and break the same-salt/same-docs pairing guarantee
    # against the other samplers
    # fail argument validation BEFORE the shared shingle relation is
    # persisted: minhash_lsh_dup_pairs raises on a bad bands config,
    # and a persist staged ahead of that raise would leak for the
    # session (advice-caught, r16)
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    cut = int(round(sample_rate * RESOLUTION))
    sample = df.filter(sample_bucket(F.col(id_col), salt=salt) < cut)

    # ONE shingle relation feeds BOTH pair generators (r16: the truth
    # and LSH sides previously each built and persisted their own —
    # one redundant tokenize+shingle pass over the sample); ownership
    # stays here and is handed out via _owned_caches below
    from my_feast_spark.operators.dedup import _with_shingles

    shingles = _with_shingles(sample, id_col, text_col, n).persist()
    truth_pairs_df = jaccard_dup_pairs(
        sample, id_col, text_col, n=n, threshold=threshold,
        shingles_df=shingles,
    )
    lsh_pairs_df = minhash_lsh_dup_pairs(
        sample, id_col, text_col, n=n, threshold=threshold,
        num_hashes=num_hashes, bands=bands, max_bucket=max_bucket,
        hash_fn=hash_fn, shingles_df=shingles,
    )
    truth = truth_pairs_df.select("doc_a", "doc_b")
    lsh = lsh_pairs_df.select("doc_a", "doc_b")

    t = truth.withColumn("__t", F.lit(1))
    l = lsh.withColumn("__l", F.lit(1))
    joined = t.join(l, ["doc_a", "doc_b"], "full_outer")
    report = joined.agg(
        F.sum("__t").alias("truth_pairs"),
        F.sum("__l").alias("lsh_pairs"),
        F.sum(F.when(F.col("__t").isNotNull() & F.col("__l").isNotNull(), 1)
              ).alias("matched"),
    )
    n_sample = sample.select(id_col).distinct().count()
    out = report.select(
        F.lit(n_sample).alias("sample_docs"),
        F.coalesce(F.col("truth_pairs"), F.lit(0)).alias("truth_pairs"),
        F.coalesce(F.col("lsh_pairs"), F.lit(0)).alias("lsh_pairs"),
        F.coalesce(F.col("matched"), F.lit(0)).alias("matched"),
        F.when(
            F.coalesce(F.col("truth_pairs"), F.lit(0)) > 0,
            floor_round(F.col("matched") / F.col("truth_pairs"), 4),
        ).alias("recall"),
        F.when(
            F.coalesce(F.col("lsh_pairs"), F.lit(0)) > 0,
            floor_round(F.col("matched") / F.col("lsh_pairs"), 4),
        ).alias("precision"),
    )
    # hand the pair generators' persisted relations AND the shared
    # shingle relation to the caller per the repo cache-ownership rule
    # (they'd otherwise pin blocks for the session lifetime on every
    # A/B evaluation)
    out._owned_caches = [
        shingles,
        *getattr(truth_pairs_df, "_owned_caches", ()),
        *getattr(lsh_pairs_df, "_owned_caches", ()),
    ]
    return out
