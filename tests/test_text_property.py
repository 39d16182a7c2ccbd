"""Property tests for the O(n) text-signal rewrites.

The sort + run-length max-frequency pass and the zip_with 2-gram build
replaced naive nested-lambda forms for performance; these properties
pin that the algebra is unchanged on arbitrary token streams.
"""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from my_feast_spark.functions.text import repetition_features_arr

tokens_strategy = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=30
)


#: randomized text-feature property sweep — redundant next to the oracle-parity value sweep;
#: slow tier (see pytest.ini)
pytestmark = pytest.mark.slow


@settings(max_examples=20, deadline=None)
@given(st.lists(tokens_strategy, min_size=1, max_size=8))
def test_repetition_features_match_python_reference(spark, docs):
    rows = [Row(i=i, toks=t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows)
    feats = repetition_features_arr(F.col("toks"))
    got = {
        r.i: (r.n, r.top, r.dup)
        for r in df.select(
            "i",
            feats["n_tokens"].alias("n"),
            feats["top_token_frac"].alias("top"),
            feats["dup_2gram_frac"].alias("dup"),
        ).collect()
    }
    for i, toks in enumerate(docs):
        n = len(toks)
        top = round(max(Counter(toks).values()) / max(n, 1), 4)
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        dup = 0.0 if n < 2 else round((len(grams) - len(set(grams))) / len(grams), 4)
        assert got[i][0] == n
        assert abs(got[i][1] - top) < 1e-9, (toks, got[i])
        assert abs(got[i][2] - dup) < 1e-9, (toks, got[i])


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=260), min_size=1, max_size=6))
def test_chunk_count_matches_rendered_chunk_array(spark, token_counts):
    """chunk_count's arithmetic must equal the length of the actual
    chunk array chunk_token_array renders, for any token count and a
    spread of size/stride shapes (it's an independent closed form)."""
    from my_feast_spark.functions.text import chunk_count, chunk_token_array

    rows = [Row(i=i, toks=["t"] * n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows)
    for size, stride in ((50, 25), (10, 10), (7, 3)):
        got = df.select(
            "i",
            F.size(chunk_token_array(F.col("toks"), size=size, stride=stride)).alias("rendered"),
            chunk_count(F.col("toks"), size=size, stride=stride).alias("arith"),
        ).collect()
        for r in got:
            assert r.rendered == r.arith, (token_counts[r.i], size, stride, r)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=5))
def test_chunk_array_agrees_with_chunk_token_array(spark, token_counts):
    """chunk_array (raw slices) and chunk_token_array (rendered text)
    must emit the same windows: same starts, and each raw chunk joined
    with spaces equals the rendered chunk_text."""
    from my_feast_spark.functions.text import chunk_array, chunk_token_array

    rows = [
        Row(i=i, toks=[f"t{j}" for j in range(n)])
        for i, n in enumerate(token_counts)
    ]
    df = spark.createDataFrame(rows)
    for size, stride in ((50, 25), (8, 8), (7, 3)):
        got = df.select(
            "i",
            chunk_array(F.col("toks"), size=size, stride=stride).alias("raw"),
            chunk_token_array(F.col("toks"), size=size, stride=stride).alias("txt"),
        ).collect()
        for r in got:
            assert [c.start for c in r.raw] == [c.start for c in r.txt]
            for raw_c, txt_c in zip(r.raw, r.txt):
                assert " ".join(raw_c.chunk) == txt_c.chunk_text
                assert len(raw_c.chunk) == txt_c.n_tokens


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_encode_strategies_agree_on_arbitrary_docs(spark, docs):
    """The map-literal and broadcast-join encodes are one encoding: for
    arbitrary token streams and the vocabulary built from them, both
    strategies must produce identical id arrays (OOV included — the
    vocab is truncated so some tokens fall out)."""
    from my_feast_spark.operators.vocab import (
        encode_ids_broadcast_join,
        encode_ids_map_literal,
        token_vocabulary,
    )

    rows = [(i, list(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "i int, toks array<string>")
    vocab_df = token_vocabulary(df, "toks", 3)
    vocab = {r.token: r.id for r in vocab_df.collect()}
    lit = {
        r.i: list(r.ids)
        for r in encode_ids_map_literal(df, "i", "toks", vocab).collect()
    }
    join = {
        r.i: list(r.ids)
        for r in encode_ids_broadcast_join(df, "i", "toks", vocab_df).collect()
    }
    assert lit == join
    # and the encoding is the obvious one
    for i, toks in enumerate(docs):
        assert lit[i] == [vocab.get(t, -1) for t in toks]


def test_encode_strategies_agree_on_empty_and_null_docs(spark):
    """r5 defect: posexplode_outer's (null, null) placeholder row for a
    zero-token doc survived the broadcast-join path as __id = -1, so an
    empty token array encoded to [-1] while the map-literal path
    returned []. Both strategies must yield [] for an empty array (incl.
    the whitespace-only-text tokenization) and NULL for a NULL array."""
    from pyspark.sql import functions as F

    from my_feast_spark.functions.text import tokens
    from my_feast_spark.operators.vocab import (
        encode_ids_broadcast_join,
        encode_ids_map_literal,
        token_vocabulary,
    )

    df = spark.createDataFrame(
        [(0, ["a", "b", "z"]), (1, []), (2, None)],
        "i int, toks array<string>",
    )
    vocab_df = token_vocabulary(df, "toks", 2)
    vocab = {r.token: r.id for r in vocab_df.collect()}
    lit = {
        r.i: r.ids and list(r.ids)
        for r in encode_ids_map_literal(df, "i", "toks", vocab).collect()
    }
    join = {
        r.i: r.ids and list(r.ids)
        for r in encode_ids_broadcast_join(df, "i", "toks", vocab_df).collect()
    }
    assert lit == join
    assert join[0] == [vocab["a"], vocab["b"], -1]
    assert join[1] == []
    assert join[2] is None

    # whitespace-only TEXT: tokens() yields [""] (one empty-string
    # token, OOV) — agreement, not a special case
    tdf = spark.createDataFrame(
        [(0, "a b"), (1, "   ")], "i int, text string"
    ).select("i", tokens(F.col("text")).alias("toks"))
    lit_t = {
        r.i: list(r.ids)
        for r in encode_ids_map_literal(tdf, "i", "toks", vocab).collect()
    }
    join_t = {
        r.i: list(r.ids)
        for r in encode_ids_broadcast_join(tdf, "i", "toks", vocab_df).collect()
    }
    assert lit_t == join_t


class TestNormalizeText:
    def test_folds_and_collapses(self, spark):
        from my_feast_spark.functions.text import normalize_text
        from pyspark.sql import functions as F

        raw = "“Sm‘art’” – café menu\x07 has\t\tspace…"
        got = spark.range(1).select(
            normalize_text(F.lit(raw)).alias("t")
        ).collect()[0]["t"]
        assert got == "\"Sm'art'\" - café menu has space..."

    def test_idempotent_on_random_text(self, spark):
        from hypothesis import HealthCheck, given, settings, strategies as st
        from my_feast_spark.functions.text import normalize_text
        from pyspark.sql import functions as F

        chars = st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        )

        @settings(max_examples=20, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(texts=st.lists(st.text(chars, max_size=60), min_size=1,
                              max_size=8))
        def run(texts):
            df = spark.createDataFrame([(t,) for t in texts], "raw string")
            once = df.select(
                "raw",
                normalize_text(F.col("raw"), lower=True).alias("n1"),
            )
            twice = once.select(
                "n1", normalize_text(F.col("n1"), lower=True).alias("n2")
            )
            for r in twice.collect():
                assert r["n1"] == r["n2"], repr((r["n1"], r["n2"]))

        run()

    def test_stays_jvm_side(self, spark):
        from my_feast_spark.functions.text import normalize_text
        from pyspark.sql import functions as F

        df = spark.range(5).select(
            normalize_text(F.lit("a b")).alias("t")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
