"""Bigram-LM quality scoring: probabilities must be a proper model
(rows sum to 1 over vocab+unseen), match a hand-computed oracle, and
rank in-domain text above gibberish."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from my_feast_spark.operators.lm import BOS, score_docs, train_bigram_lm


def _model_dict(model):
    bi = {(r.h, r.w): r.c_hw for r in model.bigrams.collect()}
    uni = {r.h: r.c_h for r in model.unigrams.collect()}
    return bi, uni


def test_matches_hand_oracle(spark):
    train = spark.createDataFrame(
        [("a b a b",), ("a b c",)], "text string"
    )
    model = train_bigram_lm(train, "text", k=0.5)
    bi, uni = _model_dict(model)
    # events: (BOS,a)x2 (a,b)x3 (b,a)x1 (b,c)x1 -> V = {a,b,c}
    assert bi == {(BOS, "a"): 2, ("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    assert uni == {BOS: 2, "a": 3, "b": 2}
    assert model.vocab_size == 3

    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    row = score_docs(docs, "doc_id", "text", model).collect()[0]

    def p(h, w):
        return (bi.get((h, w), 0) + 0.5) / (uni.get(h, 0) + 0.5 * 4)

    want = (math.log2(p(BOS, "a")) + math.log2(p("a", "b"))
            + math.log2(p("b", "c"))) / 3
    assert row.n_tokens == 3
    assert abs(row.avg_logprob - want) < 5e-4


def test_probabilities_sum_to_one(spark):
    train = spark.createDataFrame([("x y x z y",)], "text string")
    model = train_bigram_lm(train, "text", k=0.25)
    bi, uni = _model_dict(model)
    vocab = sorted({w for (_h, w) in bi})
    V1 = model.vocab_size + 1
    for h in uni:
        total = sum(
            (bi.get((h, w), 0) + 0.25) / (uni[h] + 0.25 * V1) for w in vocab
        )
        total += 0.25 / (uni[h] + 0.25 * V1)  # the shared unseen event
        assert abs(total - 1.0) < 1e-9, (h, total)


def test_in_domain_scores_above_gibberish(spark):
    from my_feast_spark.sources.readers import load_table
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    model = train_bigram_lm(docs, "text")
    probes = spark.createDataFrame([
        Row(doc_id=1, text="key agg row scan fast table value part"),
        Row(doc_id=2, text="zq zzx qqv xkcd vvq plo mnb uyt"),
    ])
    got = {r.doc_id: r.avg_logprob
           for r in score_docs(probes, "doc_id", "text", model).collect()}
    # the synthetic corpus is near-uniform word soup, so in-domain
    # perplexity sits close to the uniform/unseen floor — expect a
    # modest but strict margin, not the multi-bit gap of natural text
    assert got[1] > got[2] + 0.5, got
    model.bigrams.unpersist()
