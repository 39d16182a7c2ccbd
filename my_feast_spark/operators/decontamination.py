"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set on word n-grams.

The standard train/test-leakage check for LLM training corpora (the
GPT-3 / PaLM / Llama papers all describe a variant): a training document
is *contaminated* when it shares at least ``min_hits`` distinct word
n-grams with any benchmark document.

Scale shape (the 100 TB case): benchmark suites are tiny next to the
corpus — a few hundred thousand rows vs billions — so the benchmark
shingle set is built once and **broadcast**; the corpus side is a single
map-side explode + broadcast-hash semi-join, then one shuffle to
re-aggregate per document. No corpus self-join ever happens, and the
corpus is read exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from my_feast_spark.operators.dedup import _with_shingles


def contamination_report(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
    train_tokens_col: str | None = None,
) -> DataFrame:
    """Per-training-document contamination report.

    Returns one row per training document with >= ``min_hits`` distinct
    n-gram hits: ``(doc_id, n_hit_ngrams, n_bench_docs)`` where
    ``n_hit_ngrams`` counts the document's distinct n-grams that occur in
    ANY benchmark document and ``n_bench_docs`` counts the distinct
    benchmark documents it overlaps.

    Tokenization/shingling matches the dedup tier (lowercase, whitespace
    split, distinct word n-grams) so contamination uses the same text
    normalization as near-dup detection. ``train_tokens_col`` names a
    pre-lowercased token-array column on the train side to shingle from
    without re-tokenizing (the curation pipeline's tokenize-once path).
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col

    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # size(sh) > 0 predicate and push it below the shingle projection,
    # re-evaluating the whole (interpreted, higher-order) shingle
    # expression several times per input row inside the scan filter —
    # measured ~6x slower end-to-end. The arrays are non-empty by the
    # >= n-token filter anyway; the null guard keeps semantics identical.
    train_sh = (
        _with_shingles(train_df, id_col, text_col, n, train_tokens_col)
        .select(F.col("doc").alias("doc_id"), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    bench_sh = (
        _with_shingles(bench_df, bench_id, bench_text, n)
        .select(F.col("doc").alias("bench_id"), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    # Benchmark side is small by construction — broadcast it so the
    # corpus-side explode never shuffles on the (hot, skewed) shingle key.
    hits = train_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_hit_ngrams") >= min_hits)
    )
