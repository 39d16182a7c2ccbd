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


def _ref_kn_scores(docs, D=0.75):
    """Pure-Python interpolated KN over lowered whitespace tokens:
    count tables from the corpus, then per-doc mean log2 of
    (max(c_hw - D, 0) + D * N1+(h,*) * N1+(*,w) / N1+(*,*)) / c(h)."""
    import re

    events = {}
    for d, t in docs.items():
        toks = re.split(r"\s+", t.strip().lower())
        events[d] = [
            (BOS if i == 0 else toks[i - 1], toks[i])
            for i in range(len(toks))
        ]
    big = {}
    for evs in events.values():
        for hw in evs:
            big[hw] = big.get(hw, 0) + 1
    c_h, n1_h, n1_w = {}, {}, {}
    for (h, w), c in big.items():
        c_h[h] = c_h.get(h, 0) + c
        n1_h[h] = n1_h.get(h, 0) + 1
        n1_w[w] = n1_w.get(w, 0) + 1
    n1_all = float(len(big))
    out = {}
    for d, evs in events.items():
        lps = [
            math.log2(
                (max(big[(h, w)] - D, 0.0)
                 + D * n1_h[h] * n1_w[w] / n1_all) / c_h[h]
            )
            for h, w in evs
        ]
        out[d] = (round(sum(lps) / len(lps), 4), len(lps))
    return out


def test_kn_matches_python_reference(spark):
    """score_docs_kn on a randomized corpus equals the pure-Python
    interpolated-KN reference (self-scoring: every event seen, the
    floor never fires)."""
    import random

    from my_feast_spark.operators.lm import score_docs_kn, train_bigram_kn

    rng = random.Random(44)
    vocab = ["spark", "row", "scan", "agg", "join", "the", "a"]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for d in range(60)
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    model = train_bigram_kn(df, "text")
    got = {
        r.doc_id: (r.avg_logprob, r.n_tokens)
        for r in score_docs_kn(df, "doc_id", "text", model).collect()
    }
    model.bigrams.unpersist()
    assert got == _ref_kn_scores(docs)


def test_kn_probabilities_sum_to_one_over_seen_events(spark):
    """For every history h, summing the interpolated-KN probability over
    the CONTINUATIONS seen after h plus the interpolation mass routed to
    unseen words must give exactly 1: sum_w_seen p(w|h) + D *
    N1+(h,*) * (1 - sum_{w seen after h} Pcont(w)) / c(h) == 1 — the
    discount taken from seen bigrams is exactly the mass handed to the
    continuation distribution."""
    from my_feast_spark.operators.lm import train_bigram_kn

    train = spark.createDataFrame(
        [("a b a b c",), ("b c a",), ("c c b a",)], "text string"
    )
    model = train_bigram_kn(train, "text")
    big = {(r.h, r.w): r.c_hw for r in model.bigrams.collect()}
    uni = {r.h: (r.c_h, r.n1_h) for r in model.unigrams.collect()}
    cont = {r.w: r.n1_w for r in model.cont.collect()}
    model.bigrams.unpersist()
    D, n1_all = model.discount, float(model.n1_all)
    for h, (ch, n1h) in uni.items():
        seen = [w for (hh, w) in big if hh == h]
        p_seen = sum(
            (max(big[(h, w)] - D, 0.0) + D * n1h * cont[w] / n1_all) / ch
            for w in seen
        )
        pcont_unseen = 1.0 - sum(cont[w] / n1_all for w in seen)
        total = p_seen + D * n1h * pcont_unseen / ch
        assert abs(total - 1.0) < 1e-9, (h, total)
