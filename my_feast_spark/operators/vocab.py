"""Vocabulary build / token-id encoding for training-data pipelines.

Two encode strategies behind one vocabulary relation:

  * ``encode_ids_map_literal`` — the vocabulary enters the plan as a
    ``create_map`` literal and encoding is a map-only ``transform``
    over the projected token array. Right for SMALL vocabularies (the
    stopword/top-k case, <= a few thousand entries): no join, no
    shuffle, the whole encode rides whole-stage codegen. Wrong for
    large ones — a 100k-token vocabulary as a literal explodes the
    expression tree (plan size, codegen limits, per-task serialization).

  * ``encode_ids_broadcast_join`` — tokens are exploded WITH POSITION,
    left-joined against the (broadcast) vocabulary relation, and
    re-aggregated in order into the id array. The vocabulary never
    enters the plan tree — it ships once per executor as a broadcast
    table — so this is the 100k+-vocabulary path: cost is one
    corpus-token explode + broadcast hash join + one per-doc
    re-aggregation (partial aggs absorb the explode before the doc-id
    shuffle).

Both produce IDENTICAL id arrays (OOV -> -1), asserted in
tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def token_vocabulary(df: DataFrame, tokens_col: str, size: int) -> DataFrame:
    """``(token, id)`` for the corpus top-``size`` tokens by occurrence
    count (ties broken token-ascending); ids are dense 0..size-1 in rank
    order. The top-k lowers to TakeOrderedAndProject (never a global
    sort); the rank window runs over the ALREADY-LIMITED relation, so
    its single-partition exchange is bounded by ``size``."""
    top = (
        # explode_outer + null guard, NOT explode: plain explode makes
        # Catalyst infer a size>0 predicate pushed below the token
        # projection, re-evaluating the tokenizer per input row in the
        # scan filter (see operators/decontamination.py)
        df.select(F.explode_outer(tokens_col).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(size)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("id")
    )


def encode_ids_map_literal(
    df: DataFrame, id_col: str, tokens_col: str, vocab: dict[str, int],
    out_col: str = "ids",
) -> DataFrame:
    """``(id_col, out_col)`` with ``out_col`` = the int-id array of the
    doc's tokens under ``vocab`` (OOV -> -1). ``vocab`` is a driver-side
    dict entering the plan as a map literal — small vocabularies only
    (see module docstring)."""
    if vocab:
        vmap = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
        lookup = lambda t: F.coalesce(vmap[t], F.lit(-1))  # noqa: E731
    else:
        # create_map() with no entries types as map<void,void> and
        # map()[string-key] fails analysis — an empty vocabulary means
        # every token is OOV
        lookup = lambda t: F.lit(-1)  # noqa: E731
    ids = F.transform(F.col(tokens_col), lookup)
    return df.select(F.col(id_col), ids.alias(out_col))


def encode_ids_broadcast_join(
    df: DataFrame, id_col: str, tokens_col: str, vocab_df: DataFrame,
    out_col: str = "ids",
) -> DataFrame:
    """``(id_col, out_col)`` via posexplode -> broadcast left join on the
    ``(token, id)`` relation -> in-order re-aggregation (array_sort over
    (position, id) structs restores the sequence). The large-vocabulary
    path: the vocabulary stays out of the expression tree and ships as
    ONE broadcast table per executor."""
    # posexplode_outer keeps zero-token docs alive as ONE (null, null)
    # row — that row must survive the groupBy (so the doc encodes at
    # all) but NOT the re-aggregation (or an empty array becomes [-1],
    # diverging from the map-literal path, which returns []). collect_
    # list skips NULL elements, so guarding the struct with the
    # position's null check drops exactly that row; a NULL input array
    # (vs empty) re-emits NULL, again matching transform()'s semantics.
    flat = df.select(
        F.col(id_col),
        F.col(tokens_col).isNull().alias("__null_toks"),
        F.posexplode_outer(tokens_col).alias("__ord", "token"),
    )
    enc = flat.join(F.broadcast(vocab_df), "token", "left").select(
        id_col, "__null_toks", "__ord",
        F.coalesce(F.col("id"), F.lit(-1)).alias("__id"),
    )
    in_order = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__ord").isNotNull(), F.struct("__ord", "__id"))
            )
        ),
        lambda s: s["__id"],
    )
    return enc.groupBy(id_col).agg(
        F.when(~F.max("__null_toks"), in_order).alias(out_col)
    )
