"""Cross-document repeated-span REMOVAL — exact substring dedup.

Lee et al. ("Deduplicating Training Data Makes Language Models Better")
showed that removing exact repeated spans (not just near-dup documents)
measurably improves models. The exact suffix-array construction does
not distribute cheaply; the standard scalable approximation — used here
— works at n-gram granularity: a token span is "repeated" when its
n-grams occur in more than ``max_docs`` distinct documents, and every
repeated n-gram occurrence is cut from the text (overlapping cuts
merge, so a shared 50-token paragraph disappears as one span).

Scale shape, stage by stage:
  1. tokenize once, emit (doc, position, ngram-hash64) — map-only
     explode, the hash is 8 bytes so the shuffle never carries text;
  2. document frequency per hash — one hash aggregate (map-side
     combining; the power-law head collapses before the exchange);
  3. hot n-grams (df > max_docs) join back to their positions — the
     build side is the FILTERED hot set (boilerplate is rare), so AQE
     broadcasts it;
  4. per-doc interval merge + text rebuild — sort_array + two fold
     passes over the doc's own cut list (bounded by the doc length),
     map-only.

Precision caveat (documented, inherent to the approximation): a span
whose every n-gram is shared only piecewise with DIFFERENT documents is
still cut, and spans shorter than ``n`` tokens are never cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_feast_spark.functions.text import let, tokens


def _ngram_hashes(toks: Column, n: int) -> Column:
    """array<struct<pos,h>>: xxhash64 of each n-token window (1-based
    positions; empty below n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                # space-separated like every other n-gram build in the
                # repo: a boundary-free separator would collide windows
                # that differ only in token boundaries (['ab','c'] vs
                # ['a','bc']) and cut unshared spans
                F.xxhash64(
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, i + j) for j in range(n)],
                    )
                ).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))


def remove_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    max_docs: int = 1,
    lowercase_match: bool = True,
    out_col: str = "clean_text",
    keep: str = "all",
) -> DataFrame:
    """Cut every token span whose n-grams appear in more than
    ``max_docs`` distinct documents; returns the input plus
    ``out_col`` (cleaned text) and ``n_cut_tokens``.

    Matching is on the lowercased token stream when
    ``lowercase_match`` (cuts are applied to the ORIGINAL tokens, so
    output casing is preserved). The rebuilt text is whitespace-
    normalized (tokens joined with single spaces); documents shorter
    than ``n`` tokens are never cut.

    ``keep`` picks what happens to repeated content itself:

    * ``"all"`` (default) — cut EVERY hot occurrence: shared content
      disappears from the corpus entirely (boilerplate removal — the
      right mode when the repeated text is navigation chrome /
      licenses you never want trained on);
    * ``"first"`` — the paper's remove-all-but-one reading: the
      occurrence in the smallest ``id_col`` (ties: smallest position)
      survives per hot n-gram, so the content stays in the corpus
      exactly once. The canonical selection costs two extra aggregates
      over the HOT-occurrence relation only (boilerplate occurrences,
      not the corpus).
    """
    if keep not in ("all", "first"):
        raise ValueError(f'keep must be "all" or "first", got {keep!r}')
    toks_raw = tokens(F.col(text_col))
    match_src = F.lower(F.col(text_col)) if lowercase_match else F.col(text_col)

    grams = df.select(
        F.col(id_col),
        F.explode_outer(
            let(tokens(match_src), lambda t: _ngram_hashes(t, n))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())

    hot = (
        grams.groupBy("g.h")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") > max_docs)
        .select("h")
    )
    occurrences = grams.join(hot, grams["g.h"] == hot["h"], "left_semi")
    if keep == "first":
        # canonical survivor per hot hash: min id, then min pos within
        # it — engine-order-free (two chained min aggregates, no struct
        # comparison), both over the filtered hot relation
        min_id = occurrences.groupBy(F.col("g.h").alias("__h")).agg(
            F.min(id_col).alias("__cid")
        )
        canon = (
            occurrences.join(
                min_id,
                (F.col("g.h") == F.col("__h"))
                & (F.col(id_col) == F.col("__cid")),
            )
            .groupBy("__h", "__cid")
            .agg(F.min("g.pos").alias("__cpos"))
        )
        occurrences = occurrences.join(
            canon,
            (F.col("g.h") == F.col("__h"))
            & (F.col(id_col) == F.col("__cid"))
            & (F.col("g.pos") == F.col("__cpos")),
            "left_anti",
        )
    # cut intervals [pos, pos+n) of every (non-surviving) hot
    # occurrence, per doc
    cuts = (
        occurrences
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("g.pos").alias("s"),
                        (F.col("g.pos") + F.lit(n)).alias("e"),
                    )
                )
            ).alias("__cuts")
        )
    )

    # merge overlapping/adjacent intervals with one fold over the
    # sorted cut list: extend the open interval or append a new one
    empty = F.array().cast("array<struct<s:int,e:int>>")
    merged = F.aggregate(
        F.coalesce(F.col("__cuts"), empty),
        empty,
        lambda acc, c: F.when(
            F.get(acc, F.size(acc) - 1)["e"] >= c["s"],
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.get(acc, F.size(acc) - 1)["s"].alias("s"),
                        F.greatest(
                            F.get(acc, F.size(acc) - 1)["e"], c["e"]
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(c))),
    )

    joined = df.join(cuts, id_col, "left")
    # keep tokens whose 1-based position falls in no merged interval;
    # fold the merged cuts once into a total cut-token count, then
    # rebuild the text from the complement slices
    return (
        joined.withColumn("__merged", merged)
        .withColumn(
            "n_cut_tokens",
            F.aggregate(
                F.col("__merged"),
                F.lit(0),
                lambda acc, c: acc + (c["e"] - c["s"]),
            ),
        )
        .withColumn(
            out_col,
            let(
                toks_raw,
                lambda t: F.concat_ws(
                    " ",
                    F.filter(
                        F.transform(
                            t, lambda x, i: F.struct(x.alias("w"), (i + 1).alias("p"))
                        ),
                        lambda s: ~F.exists(
                            F.col("__merged"),
                            lambda c: (s["p"] >= c["s"]) & (s["p"] < c["e"]),
                        ),
                    ).getField("w"),
                ),
            ),
        )
        .drop("__cuts", "__merged")
    )
