"""Repeated-span removal: shared paragraphs are cut as single merged
spans, unique text survives, casing is preserved, and the result
matches a pure-Python reference on randomized corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from my_feast_spark.operators.span_dedup import remove_repeated_spans

SHARED = "one two three four five six seven"  # 7 tokens, n=5 -> hot


def _ref_remove(docs: dict[int, str], n: int, max_docs: int):
    """Reference: hash n-grams of the lowercased token stream, find
    those in > max_docs distinct docs, merge the cut intervals, drop."""
    toks = {d: t.split() for d, t in docs.items()}
    low = {d: [w.lower() for w in ws] for d, ws in toks.items()}
    df_count: dict[tuple, set] = {}
    for d, ws in low.items():
        for i in range(len(ws) - n + 1):
            df_count.setdefault(tuple(ws[i:i + n]), set()).add(d)
    hot = {g for g, ds in df_count.items() if len(ds) > max_docs}
    out = {}
    for d, ws in toks.items():
        cut = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if tuple(low[d][i:i + n]) in hot:
                for j in range(i, i + n):
                    cut[j] = True
        out[d] = (
            " ".join(w for w, c in zip(ws, cut) if not c),
            sum(cut),
        )
    return out


def test_shared_paragraph_is_cut_unique_text_survives(spark):
    docs = {
        1: f"alpha beta {SHARED} gamma delta",
        2: f"epsilon {SHARED} zeta",
        3: "totally unique text with no overlap at all",
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in docs.items()]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in remove_repeated_spans(df, "doc_id", "text", n=5).collect()
    }
    assert got[1] == ("alpha beta gamma delta", 7)
    assert got[2] == ("epsilon zeta", 7)
    assert got[3] == (docs[3], 0)


def test_casing_preserved_and_case_insensitive_match(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text=f"Keep Me {SHARED.upper()} And Me"),
        Row(doc_id=2, text=f"x {SHARED} y"),
    ])
    got = {
        r.doc_id: r.clean_text
        for r in remove_repeated_spans(df, "doc_id", "text", n=5).collect()
    }
    assert got[1] == "Keep Me And Me"  # matched despite casing; kept text cased


def test_short_docs_never_cut(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="tiny doc"),
        Row(doc_id=2, text="tiny doc"),
    ])
    got = remove_repeated_spans(df, "doc_id", "text", n=5).collect()
    assert all(r.n_cut_tokens == 0 and r.clean_text == "tiny doc" for r in got)


words = st.sampled_from(["a", "b", "c", "d", "e"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(st.lists(words, min_size=0, max_size=12), min_size=1,
                     max_size=6))
def test_matches_reference_on_random_corpora(spark, docs):
    corpus = {i: " ".join(ws) for i, ws in enumerate(docs)}
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in corpus.items()]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in remove_repeated_spans(df, "doc_id", "text", n=3).collect()
    }
    want = _ref_remove(corpus, n=3, max_docs=1)
    assert got == want
