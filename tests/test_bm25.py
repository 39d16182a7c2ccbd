"""BM25 retrieval (operators/bm25.py): scoring semantics against a
pure-Python reference, determinism of the scaled-integer sum, and the
plan shape (query/df/stats broadcast; one corpus shuffle)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from my_feast_spark.operators.bm25 import SCALE, bm25_topk

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark broadcasts small tables"),
    (2, "the cluster runs spark and the cluster runs flink"),
    (3, "flink streams data"),
    (4, "completely unrelated text here"),
]
QT = [("q1", "spark"), ("q1", "cluster"), ("q2", "flink")]


def _reference_scores(k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out: dict[tuple[str, int], int] = {}
    for q, term in QT:
        for d, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            out[(q, d)] = out.get((q, d), 0) + round(c * SCALE)
    return out


def test_scores_match_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in DOCS]
    )
    qt = spark.createDataFrame(
        [Row(query_id=q, term=t) for q, t in QT]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_scaled"]
        for r in bm25_topk(docs, "doc_id", "text", qt, k=10).collect()
    }
    assert got == _reference_scores()


def test_rank_and_tiebreak(spark):
    """doc 2 mentions 'cluster' twice + 'spark' once -> must outrank
    doc 0 for q1; k caps the result; ranks are 1-based contiguous."""
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    qt = spark.createDataFrame([Row(query_id=q, term=t) for q, t in QT])
    rows = bm25_topk(docs, "doc_id", "text", qt, k=2).collect()
    q1 = sorted(
        [r for r in rows if r["query_id"] == "q1"], key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in q1] == [2, 0]
    assert [r["rank"] for r in q1] == [1, 2]
    assert all(len([r for r in rows if r["query_id"] == q]) <= 2
               for q in ("q1", "q2"))


def test_score_is_scaled_quotient(spark):
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    qt = spark.createDataFrame([Row(query_id=q, term=t) for q, t in QT])
    for r in bm25_topk(docs, "doc_id", "text", qt).collect():
        assert r["score"] == r["score_scaled"] / float(SCALE)


def test_plan_broadcasts_small_sides(spark):
    """Query terms, the pruned df relation and the stats scalar must be
    broadcast; the only hash exchanges key the corpus-sized tf/dl
    aggregations, never the scored join."""
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    qt = spark.createDataFrame([Row(query_id=q, term=t) for q, t in QT])
    plan = (
        bm25_topk(docs, "doc_id", "text", qt)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
