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


def _ref_remove_keep_first(docs: dict[int, str], n: int, max_docs: int):
    """Reference for keep="first": per hot n-gram, the occurrence at
    (min doc id, then min position) survives; every other occurrence
    is cut."""
    toks = {d: t.split() for d, t in docs.items()}
    low = {d: [w.lower() for w in ws] for d, ws in toks.items()}
    occs: dict[tuple, list] = {}
    for d in sorted(low):
        ws = low[d]
        for i in range(len(ws) - n + 1):
            occs.setdefault(tuple(ws[i:i + n]), []).append((d, i))
    out = {}
    cut = {d: [False] * len(ws) for d, ws in toks.items()}
    for g, positions in occs.items():
        if len({d for d, _ in positions}) <= max_docs:
            continue
        canon = min(positions)
        for d, i in positions:
            if (d, i) == canon:
                continue
            for j in range(i, i + n):
                cut[d][j] = True
    for d, ws in toks.items():
        out[d] = (
            " ".join(w for w, c in zip(ws, cut[d]) if not c),
            sum(cut[d]),
        )
    return out


def test_keep_first_preserves_one_canonical_copy(spark):
    """keep="first": the min-id doc keeps the shared paragraph, every
    other doc loses it; keep="all" (default) cuts it everywhere."""
    docs = {
        1: f"alpha {SHARED} omega",
        2: f"{SHARED} something else entirely here",
        3: "totally unique text with no overlap at all",
    }
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    first = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in remove_repeated_spans(
            df, "doc_id", "text", n=5, max_docs=1, keep="first"
        ).collect()
    }
    assert first == _ref_remove_keep_first(docs, 5, 1)
    # doc 1 (min id) keeps the paragraph intact
    assert first[1] == (f"alpha {SHARED} omega", 0)
    # doc 2 loses exactly the shared 7 tokens
    assert first[2] == ("something else entirely here", 7)
    assert first[3][1] == 0
    # default unchanged: both copies cut
    alldrop = {
        r.doc_id: r.n_cut_tokens
        for r in remove_repeated_spans(
            df, "doc_id", "text", n=5, max_docs=1
        ).collect()
    }
    assert alldrop[1] == 7 and alldrop[2] == 7

    import pytest

    with pytest.raises(ValueError, match="keep"):
        remove_repeated_spans(df, "doc_id", "text", keep="last")


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.dictionaries(
        st.integers(0, 6),
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0, max_size=14,
        ).map(" ".join),
        min_size=1, max_size=5,
    )
)
def test_keep_first_matches_reference_on_random_corpora(spark, docs):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens)
        for r in remove_repeated_spans(
            df, "doc_id", "text", n=3, max_docs=1, keep="first"
        ).collect()
    }
    assert got == _ref_remove_keep_first(docs, 3, 1)
