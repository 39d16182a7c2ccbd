"""N-gram language-model quality scoring — the perplexity filter.

Production curation (CCNet, Gopher, RedPajama) scores every document
with a small n-gram LM trained on trusted text and drops the
high-perplexity tail. This module is that loop, Spark-native: train a
bigram model (two count tables — vocabulary-sized, built in one corpus
pass each) and score documents with their average per-token log
probability under add-k smoothing.

Scale shape: the model IS two aggregate tables; training never holds
more than (vocab + bigram-vocab) rows. Scoring explodes each doc's
bigrams and joins them to the count tables — both joins are keyed on
vocabulary-sized relations, so AQE broadcasts them below its threshold
and shuffle-joins above it; per-doc reduction is one hash aggregate.
A document containing ONLY out-of-vocabulary tokens still scores
(smoothing gives unseen events mass), so scoring is total.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_feast_spark.functions.scalar import floor_round
from my_feast_spark.functions.text import let, tokens

#: sentinel bigram history for the first token of each document
BOS = "<s>"


@dataclass
class BigramLM:
    """Counts + constants needed to score: p(w | h) =
    (c(h, w) + k) / (c(h) + k * (V + 1)) — add-k over the training
    vocabulary plus one shared unseen event."""

    unigrams: DataFrame  # (h, c_h): history counts incl. BOS
    bigrams: DataFrame   # (h, w, c_hw)
    vocab_size: int
    k: float


def _doc_bigrams(text_col, lowercase: bool):
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    # index walk over the let-bound token slot, not
    # zip_with(concat(BOS, slice(...)), toks): building the shifted
    # history ARRAY per row costs two interpreted array constructions
    # before the zip even runs — measured 4x slower on first touch
    # (expression compilation included) and ~25% slower warm at sf0.1.
    # The size guard stays: sequence(1, 0) would count DOWN.
    return let(
        tokens(t),
        lambda toks: F.when(
            F.size(toks) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.size(toks)),
                lambda i: F.struct(
                    F.when(i == 1, F.lit(BOS))
                    .otherwise(F.element_at(toks, i - 1))
                    .alias("h"),
                    F.element_at(toks, i).alias("w"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<h:string,w:string>>")),
    )


def train_bigram_lm(
    df: DataFrame,
    text_col: str,
    *,
    k: float = 0.5,
    lowercase: bool = True,
) -> BigramLM:
    """Fit the count tables (two corpus passes: bigrams, then history
    marginals derived from the bigram table — so the second 'pass' is
    an aggregate over the vocab-sized counts, not the corpus)."""
    pairs = df.select(
        F.explode_outer(_doc_bigrams(text_col, lowercase)).alias("p")
    ).filter(F.col("p").isNotNull())
    bigrams = (
        pairs.groupBy("p.h", "p.w")
        .agg(F.count(F.lit(1)).alias("c_hw"))
        .persist()
    )
    unigrams = bigrams.groupBy("h").agg(F.sum("c_hw").alias("c_h"))
    vocab_size = bigrams.select("w").distinct().count()
    return BigramLM(unigrams=unigrams, bigrams=bigrams,
                    vocab_size=vocab_size, k=k)


def score_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: BigramLM,
    *,
    lowercase: bool = True,
    out_col: str = "avg_logprob",
) -> DataFrame:
    """Per-document mean log2 probability under the model (higher =
    more in-domain). Left joins keep OOV bigrams, which fall back to
    the smoothed unseen-event probability; token-less documents have no
    events and are absent from the output (left-join back if needed)."""
    V1 = model.vocab_size + 1
    k = model.k
    ev = df.select(
        F.col(id_col),
        F.explode(_doc_bigrams(text_col, lowercase)).alias("p"),
    ).select(id_col, F.col("p.h").alias("h"), F.col("p.w").alias("w"))
    scored = (
        ev.join(model.bigrams, ["h", "w"], "left")
        .join(model.unigrams, ["h"], "left")
        .withColumn(
            "__lp",
            F.log2(
                (F.coalesce(F.col("c_hw"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c_h"), F.lit(0)) + F.lit(k * V1))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        floor_round(F.avg("__lp"), 4).alias(out_col),
        F.count("__lp").alias("n_tokens"),
    )


@dataclass
class KNBigramLM:
    """Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; Chen &
    Goodman 1999) — the smoothing the production perplexity filters
    actually run (CCNet's KenLM is modified KN): p(w | h) =
    (max(c(h,w) - D, 0) + D * N1+(h,*) * Pcont(w)) / c(h), with the
    continuation probability Pcont(w) = N1+(*,w) / N1+(*,*) replacing
    raw unigram frequency — "how many contexts does w follow" rather
    than "how often does w occur"."""

    bigrams: DataFrame   # (h, w, c_hw)
    unigrams: DataFrame  # (h, c_h, n1_h): totals + distinct continuations
    cont: DataFrame      # (w, n1_w): distinct histories preceding w
    n1_all: int          # distinct bigram types
    discount: float


def train_bigram_kn(
    df: DataFrame,
    text_col: str,
    *,
    discount: float = 0.75,
    lowercase: bool = True,
) -> KNBigramLM:
    """Fit the KN count tables: ONE corpus pass builds the bigram
    counts; every other statistic (history totals, continuation fan-in
    and fan-out, the bigram-type total) is an aggregate over the
    vocab-sized count relation, never the corpus. The bigram relation
    is persisted (it feeds three derived aggregates plus scoring) and
    handed to the caller via the model — unpersist it when done."""
    pairs = df.select(
        F.explode_outer(_doc_bigrams(text_col, lowercase)).alias("p")
    ).filter(F.col("p").isNotNull())
    bigrams = (
        pairs.groupBy("p.h", "p.w")
        .agg(F.count(F.lit(1)).alias("c_hw"))
        .persist()
    )
    unigrams = bigrams.groupBy("h").agg(
        F.sum("c_hw").alias("c_h"),
        F.count(F.lit(1)).alias("n1_h"),
    )
    cont = bigrams.groupBy("w").agg(F.count(F.lit(1)).alias("n1_w"))
    n1_all = bigrams.count()
    if n1_all == 0:
        # a token-less corpus would make every continuation probability
        # 0/0 downstream — fail at fit time like train_nb / fit_dsir do,
        # releasing the cache on the error path
        bigrams.unpersist()
        raise ValueError(
            "train_bigram_kn: corpus has no tokens (0 bigram events)"
        )
    return KNBigramLM(
        bigrams=bigrams, unigrams=unigrams, cont=cont,
        n1_all=n1_all, discount=discount,
    )


def score_docs_kn(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: KNBigramLM,
    *,
    lowercase: bool = True,
    out_col: str = "avg_logprob",
) -> DataFrame:
    """Per-document mean log2 probability under interpolated KN.

    Same plan shape as :func:`score_docs` — explode bigram events, join
    the (vocab-sized, AQE-broadcastable) count relations, one hash
    aggregate per doc. Events unseen in training fall through to a
    1e-12 probability floor (KN gives zero continuation mass to a
    never-seen word); self-scoring the training corpus — the workload's
    oracle-parity configuration — never hits the floor."""
    D = float(model.discount)
    ev = df.select(
        F.col(id_col),
        F.explode(_doc_bigrams(text_col, lowercase)).alias("p"),
    ).select(id_col, F.col("p.h").alias("h"), F.col("p.w").alias("w"))
    p = (
        F.greatest(
            F.coalesce(F.col("c_hw"), F.lit(0)) - F.lit(D), F.lit(0.0)
        )
        + F.lit(D)
        * F.coalesce(F.col("n1_h"), F.lit(0))
        * F.coalesce(F.col("n1_w"), F.lit(0))
        / F.lit(float(model.n1_all))
    ) / F.col("c_h")
    scored = (
        ev.join(model.bigrams, ["h", "w"], "left")
        .join(model.unigrams, ["h"], "left")
        .join(model.cont, ["w"], "left")
        .withColumn("__lp", F.log2(F.greatest(p, F.lit(1e-12))))
    )
    return scored.groupBy(id_col).agg(
        floor_round(F.avg("__lp"), 4).alias(out_col),
        F.count("__lp").alias("n_tokens"),
    )
