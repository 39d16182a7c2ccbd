"""Property tests for the O(n) text-signal rewrites.

The sort + run-length max-frequency pass and the zip_with 2-gram build
replaced naive nested-lambda forms for performance; these properties
pin that the algebra is unchanged on arbitrary token streams.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from my_feast_spark.functions.text import repetition_features_arr

tokens_strategy = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=30
)


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
