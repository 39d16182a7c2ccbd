"""Naive-Bayes quality classifier — the linear reference-vs-crawl filter.

Production curation pipelines (the GPT-3 / PaLM data recipes, CCNet's
companion filter) score every crawl document with a LINEAR classifier
trained to separate a trusted reference corpus from raw crawl, and keep
the high-scoring tail. This module is that loop with a multinomial
Naive Bayes model — the one linear text classifier whose training is
PURE AGGREGATION, so it fits Spark natively:

  * train — ONE corpus pass: per-token positive/negative counts (a hash
    aggregate over the exploded token stream, map-side combining on the
    power-law head) plus four scalars (class token totals, vocabulary
    size, doc-count priors). The model IS the vocab-sized count table.
  * score — explode each doc's tokens, ONE broadcast join against the
    (vocab-sized) per-token log-likelihood-ratio relation, one hash
    aggregate per doc. OOV tokens fall back to the smoothed unseen-event
    ratio, so scoring is total.

Add-k smoothing over the training vocabulary plus one shared unseen
event, mirroring ``operators/lm.py``; log2 throughout so a DuckDB
oracle replays scores bit-for-bit up to summation order (rounded).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_feast_spark.functions.text import tokens


@dataclass
class NBModel:
    """Per-token log2-likelihood ratios + the scalars needed to score.

    ``token_llr`` is (token, llr) with llr = log2 P(t|pos) - log2
    P(t|neg) under add-k; ``oov_llr`` is the same ratio for a token
    unseen in training; ``prior_logodds`` = log2(n_pos_docs /
    n_neg_docs). The relation is persisted by the trainer — callers
    that materialize scores release it (the repo cache-ownership rule).
    """

    token_llr: DataFrame
    prior_logodds: float
    oov_llr: float
    k: float


def _doc_tokens(text_col, lowercase: bool, tokens_col: str | None = None) -> Column:
    if tokens_col is not None:
        # pipelines (curation) project the lowered token array ONCE and
        # fan it out to every consumer — skip re-tokenizing
        return F.col(tokens_col)
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return tokens(t)


def train_nb(
    df: DataFrame,
    text_col: str | None,
    label_col: str,
    *,
    k: float = 0.5,
    lowercase: bool = True,
    tokens_col: str | None = None,
) -> NBModel:
    """Fit the count model. ``label_col`` is a boolean column (True =
    positive / reference class). One distributed pass builds the
    per-token class counts; the four scalars (totals, vocab size, doc
    priors) come back in a single 1-row collect."""
    toks = df.select(
        F.col(label_col).cast("boolean").alias("__pos"),
        F.explode_outer(
            _doc_tokens(text_col, lowercase, tokens_col)
        ).alias("token"),
    ).filter(F.col("token").isNotNull())
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
        )
        .persist()
    )
    tot = counts.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    docs = df.agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col(label_col).cast("boolean"), 0).otherwise(1)).alias("n_neg"),
    ).collect()[0]
    if not docs["n_pos"] or not docs["n_neg"]:
        # same hygiene as the tokenless-corpus path below: never leave the
        # counts relation pinned for the session on a validation failure
        counts.unpersist()
        raise ValueError("training needs at least one doc of each class")
    if not tot["v"]:
        # every doc was NULL/token-less: the counts relation is empty and
        # t_pos/t_neg came back NULL — fail with the real cause instead of
        # a NoneType+float TypeError in the denominator arithmetic below
        counts.unpersist()
        raise ValueError("training corpus has no tokens")
    import math

    v1 = tot["v"] + 1
    den_pos = tot["t_pos"] + k * v1
    den_neg = tot["t_neg"] + k * v1
    llr = counts.select(
        "token",
        (
            F.log2((F.col("c_pos") + F.lit(k)) / F.lit(den_pos))
            - F.log2((F.col("c_neg") + F.lit(k)) / F.lit(den_neg))
        ).alias("llr"),
    )
    # hand the persisted count relation's lifetime to the llr relation's
    # consumers: llr is a projection of it, so the cache backs every
    # score join until the caller releases it
    llr._owned_caches = [counts]
    return NBModel(
        token_llr=llr,
        prior_logodds=math.log2(docs["n_pos"] / docs["n_neg"]),
        oov_llr=math.log2(k / den_pos) - math.log2(k / den_neg),
        k=k,
    )


def score_nb(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    model: NBModel,
    *,
    lowercase: bool = True,
    tokens_col: str | None = None,
    out_col: str = "log_odds",
    decimals: int = 4,
) -> DataFrame:
    """Per-document log2 odds of the positive class: prior + the sum of
    per-token likelihood ratios (OOV -> the smoothed unseen ratio), plus
    ``pred`` (1 when the ROUNDED log-odds is positive — rounded so two
    engines can never disagree on a boundary within float noise) and
    ``n_tokens``. Token-less documents have no events and are absent
    (left-join back if needed)."""
    ev = df.select(
        F.col(id_col),
        F.explode(_doc_tokens(text_col, lowercase, tokens_col)).alias("token"),
    )
    scored = ev.join(F.broadcast(model.token_llr), "token", "left").withColumn(
        "__llr", F.coalesce(F.col("llr"), F.lit(model.oov_llr))
    )
    out = scored.groupBy(id_col).agg(
        F.round(F.lit(model.prior_logodds) + F.sum("__llr"), decimals).alias(out_col),
        F.count("__llr").alias("n_tokens"),
    )
    return out.withColumn(
        "pred", (F.col(out_col) > 0).cast("int")
    )
