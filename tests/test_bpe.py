"""BPE trainer vs a pure-Python reference implementation.

The reference mirrors Sennrich et al.'s algorithm: word-frequency
table, chars + </w> start symbols, per-round weighted pair argmax
(ties broken lexicographically, matching the operator), greedy
left-to-right merge. The Spark trainer must reproduce the merge list
exactly, round for round.
"""

from __future__ import annotations

from collections import Counter

import pytest

from my_feast_spark.operators.bpe import EOW, train_bpe_merges

#: both training paths must produce identical merge lists: the default
#: driver-side loop (one corpus pass + in-process rounds) and the
#: distributed escape hatch (2 jobs/round over the checkpointed table)
BOTH_PATHS = pytest.mark.parametrize("dist", [False, True],
                                     ids=["driver", "distributed"])


def _ref_bpe(word_counts: dict[str, int], rounds: int, min_count: int = 2):
    vocab = {
        tuple(list(w) + [EOW]): n for w, n in word_counts.items()
    }
    merges = []
    for _ in range(rounds):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
        merges.append({"left": a, "right": b, "merged": a + b, "count": cnt})
    return merges


def _corpus_df(spark, word_counts):
    rows = []
    doc = []
    for w, n in word_counts.items():
        doc.extend([w] * n)
    # spread the words over a few documents
    k = max(1, len(doc) // 7)
    for i in range(0, len(doc), k):
        rows.append((" ".join(doc[i:i + k]),))
    return spark.createDataFrame(rows, "text string")


@BOTH_PATHS
def test_matches_reference_on_sennrich_example(spark, dist):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = train_bpe_merges(_corpus_df(spark, wc), "text", rounds=10,
                           distributed_rounds=dist)
    want = _ref_bpe(wc, rounds=10)
    assert got == want
    # sanity: the classic first merges appear
    assert {m["merged"] for m in got} >= {"es", "est"}


@BOTH_PATHS
def test_overlapping_runs_merge_greedily(spark, dist):
    # 'aaaa' under (a,a): greedy left-to-right gives [aa, aa], so round
    # 2's top pair is (aa, aa) — a chain-merge bug would diverge here
    wc = {"aaaa": 4, "aab": 3}
    got = train_bpe_merges(_corpus_df(spark, wc), "text", rounds=4,
                           distributed_rounds=dist)
    want = _ref_bpe(wc, rounds=4)
    assert got == want


@BOTH_PATHS
def test_min_count_stops_training(spark, dist):
    wc = {"ab": 1, "cd": 1}
    got = train_bpe_merges(
        _corpus_df(spark, wc), "text", rounds=5, min_pair_count=3,
        distributed_rounds=dist,
    )
    assert got == []


@BOTH_PATHS
def test_no_pinned_blocks_survive(spark, dist):
    wc = {"low": 5, "newest": 6}
    base = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    train_bpe_merges(_corpus_df(spark, wc), "text", rounds=3,
                     distributed_rounds=dist)
    now = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert now - base == set(), "trainer leaked checkpoint blocks"


def test_encode_paths_agree_and_roundtrip(spark):
    """Expression replay (merge order) and the Arrow rank-replay encoder
    must produce identical symbol sequences; concatenating the symbols
    and stripping the marker must reconstruct the word."""
    from pyspark.sql import functions as F

    from my_feast_spark.operators.bpe import (
        apply_bpe_merges,
        bpe_encode_udf,
    )

    wc = {"low": 5, "lower": 2, "lowest": 4, "newest": 6, "widest": 3,
          "aaaa": 3, "aab": 2}
    merges = train_bpe_merges(_corpus_df(spark, wc), "text", rounds=8)
    assert merges

    words = spark.createDataFrame([(w,) for w in wc], "word string")
    start = F.concat(
        F.filter(F.split(F.col("word"), "(?!^)"), lambda x: x != ""),
        F.array(F.lit(EOW)),
    )
    both = words.select(
        "word",
        F.concat_ws(" ", apply_bpe_merges(start, merges)).alias("via_expr"),
        bpe_encode_udf(merges)(F.col("word")).alias("via_udf"),
    ).collect()
    for r in both:
        assert r.via_expr == r.via_udf, (r.word, r.via_expr, r.via_udf)
        assert r.via_expr.replace(" ", "").replace(EOW, "") == r.word


def test_vocab_covers_every_encoded_symbol(spark):
    """Every symbol the encoder emits must have an id; alphabet ids
    precede merge ids and stay stable when training extends."""
    from pyspark.sql import functions as F

    from my_feast_spark.operators.bpe import bpe_encode_udf, bpe_vocab

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    corpus = _corpus_df(spark, wc)
    merges = train_bpe_merges(corpus, "text", rounds=6)
    vocab = bpe_vocab(corpus, "text", merges)
    ids = {v["symbol"]: v["token_id"] for v in vocab}
    assert len(ids) == len(vocab), "duplicate symbols in vocab"

    encoded = corpus.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).distinct().select(bpe_encode_udf(merges)(F.col("w")).alias("enc"))
    emitted = {s for r in encoded.collect() for s in r.enc.split(" ")}
    assert emitted <= set(ids), emitted - set(ids)

    # extension stability: retraining with MORE rounds preserves ids
    merges2 = train_bpe_merges(corpus, "text", rounds=8)
    assert merges2[:6] == merges
    vocab2 = bpe_vocab(corpus, "text", merges2)
    assert vocab2[: len(vocab)] == vocab


def test_vocab_dedupes_same_surface_merges(spark):
    """('a','bc') and ('ab','c') both surface as 'abc': the id table
    must keep ONE entry (first occurrence), ids stay dense and the
    symbol->id map unambiguous — and still extension-stable."""
    from my_feast_spark.operators.bpe import bpe_vocab

    corpus = spark.createDataFrame([("abc bc ab",)], "text string")
    merges = [
        {"left": "b", "right": "c", "merged": "bc", "count": 3},
        {"left": "a", "right": "bc", "merged": "abc", "count": 2},
        {"left": "a", "right": "b", "merged": "ab", "count": 2},
        {"left": "ab", "right": "c", "merged": "abc", "count": 1},  # dup surface
    ]
    vocab = bpe_vocab(corpus, "text", merges)
    syms = [v["symbol"] for v in vocab]
    assert len(syms) == len(set(syms)), "duplicate surface symbols"
    assert [v["token_id"] for v in vocab] == list(range(len(vocab)))
    # first occurrence wins; truncating the merge list preserves ids
    vocab_prefix = bpe_vocab(corpus, "text", merges[:3])
    assert vocab == vocab_prefix + []  # same table: dup added nothing
    assert syms.index("abc") < syms.index("ab")


def test_bpe_trainer_collect_is_bounded(spark):
    """wordpiece.py's bound contract, shared: min_word_count floors the
    aggregate, max_train_words caps the collected table to the top-N by
    (count desc, word asc) — training with the cap equals training on
    the hand-truncated table."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from my_feast_spark.operators.bpe import EOW, _merge_loop_local

    core = ["aaab aaac aaad"] * 30
    tail = [f"t{i:04d}" for i in range(1000)]
    texts = core + [" ".join(tail[i : i + 10]) for i in range(0, 1000, 10)]
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = train_bpe_merges(corpus, "text", rounds=6, max_train_words=16)

    # oracle: the exact word table, hand-truncated the same way
    from my_feast_spark.operators.bpe import tokens

    wc = {
        r["word"]: int(r["n"])
        for r in corpus.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("word")
        ).groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    local_vocab = {tuple(w) + (EOW,): n for w, n in top}
    assert got == _merge_loop_local(local_vocab, 6, 2)

    # frequency floor drops the singleton tail entirely
    floored = train_bpe_merges(
        corpus, "text", rounds=6, min_word_count=2, max_train_words=None
    )
    core_vocab = {
        tuple(w) + (EOW,): 30 for w in ["aaab", "aaac", "aaad"]
    }
    assert floored == _merge_loop_local(core_vocab, 6, 2)
