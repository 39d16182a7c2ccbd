"""Naive-Bayes quality classifier — semantics, OOV totality, releases.

Oracle strategy: a hand-computed reference on a tiny corpus (the count
model is small enough to verify by arithmetic), plus the DuckDB parity
row (`nb_quality_score`) at sf0.01 via test_oracle_parity.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from my_feast_spark.operators.classifier import score_nb, train_nb


@pytest.fixture()
def tiny(spark):
    # positive class: "good clean prose"; negative: "spam spam buy"
    rows = [
        (0, True, "good clean prose here"),
        (1, True, "clean prose reads well"),
        (2, False, "buy spam buy spam"),
        (3, False, "spam offer buy now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, pos boolean, text string")


def _ref_model(rows, k=0.5):
    from collections import Counter

    cp, cn = Counter(), Counter()
    n_pos = n_neg = 0
    for _id, pos, text in rows:
        (cp if pos else cn).update(text.lower().split())
        n_pos, n_neg = n_pos + pos, n_neg + (not pos)
    vocab = set(cp) | set(cn)
    v1 = len(vocab) + 1
    dp, dn = sum(cp.values()) + k * v1, sum(cn.values()) + k * v1

    def llr(t):
        return math.log2((cp[t] + k) / dp) - math.log2((cn[t] + k) / dn)

    prior = math.log2(n_pos / n_neg)
    return llr, prior


def test_scores_match_hand_reference(spark, tiny):
    rows = [(r.doc_id, r.pos, r.text) for r in tiny.collect()]
    llr, prior = _ref_model(rows)
    model = train_nb(tiny, "text", "pos")
    got = {
        r.doc_id: (r.log_odds, r.pred, r.n_tokens)
        for r in score_nb(tiny, "doc_id", "text", model).collect()
    }
    for doc_id, _pos, text in rows:
        toks = text.lower().split()
        want = round(prior + sum(llr(t) for t in toks), 4)
        assert got[doc_id][0] == pytest.approx(want, abs=1e-4), doc_id
        assert got[doc_id][2] == len(toks)
    # the classifier separates the training classes
    assert got[0][1] == 1 and got[1][1] == 1
    assert got[2][1] == 0 and got[3][1] == 0
    for c in model.token_llr._owned_caches:
        c.unpersist()


def test_oov_docs_score_totally(spark, tiny):
    """A doc of entirely unseen tokens must still score (the shared
    smoothed unseen event), with the constant per-token OOV ratio."""
    model = train_nb(tiny, "text", "pos")
    held_out = spark.createDataFrame(
        [(99, "zzz qqq xxx")], "doc_id long, text string"
    )
    r = score_nb(held_out, "doc_id", "text", model).collect()[0]
    want = round(model.prior_logodds + 3 * model.oov_llr, 4)
    assert r.log_odds == pytest.approx(want, abs=1e-4)
    assert r.n_tokens == 3
    for c in model.token_llr._owned_caches:
        c.unpersist()


def test_single_class_training_raises(spark):
    df = spark.createDataFrame(
        [(0, True, "a b"), (1, True, "c d")],
        "doc_id long, pos boolean, text string",
    )
    with pytest.raises(ValueError, match="each class"):
        train_nb(df, "text", "pos")


def test_tokenless_corpus_training_raises(spark):
    # both classes present but every doc NULL (empty/whitespace text
    # still yields the "" token): the token-count relation is empty —
    # must fail with the real cause, not a NoneType TypeError from the
    # NULL denominators
    df = spark.createDataFrame(
        [(0, True, None), (1, False, None)],
        "doc_id long, pos boolean, text string",
    )
    with pytest.raises(ValueError, match="no tokens"):
        train_nb(df, "text", "pos")


def test_trainer_releases_cleanly(spark, tiny):
    def pinned():
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        }

    base = pinned()
    model = train_nb(tiny, "text", "pos")  # training collects scalars
    score_nb(tiny, "doc_id", "text", model).count()
    for c in model.token_llr._owned_caches:
        c.unpersist(blocking=True)
    assert pinned() - base == set(), "train_nb leaked its count cache"
